package org.dss.udf;

import org.apache.spark.sql.api.java.UDF2;

/**
 * Two-argument JVM UDF: repeat a string k times, k clamped to [0, 8]
 * (bounded so a bad argument can't blow up executor memory).
 */
public class BoundedRepeat implements UDF2<String, Integer, String> {
  @Override
  public String call(String s, Integer k) {
    if (s == null || k == null) {
      return null;
    }
    int times = Math.max(0, Math.min(k, 8));
    StringBuilder sb = new StringBuilder(s.length() * times);
    for (int i = 0; i < times; i++) {
      sb.append(s);
    }
    return sb.toString();
  }
}
