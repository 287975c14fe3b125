package org.dss.udf;

import org.apache.spark.sql.api.java.UDF1;

/**
 * JAR-packaged JVM UDF: number of ASCII vowels in a string.
 *
 * The engine registers this class by name via the
 * CREATE FUNCTION ... AS 'org.dss.udf.VowelCount' USING JAR '...' DDL
 * surface (mirroring the reference's Hive-UDF registration,
 * DirectSessionCatalog.scala:72-91), routed to
 * spark.udf.registerJavaFunction.
 */
public class VowelCount implements UDF1<String, Integer> {
  @Override
  public Integer call(String s) {
    if (s == null) {
      return null;
    }
    int n = 0;
    String lower = s.toLowerCase();
    for (int i = 0; i < lower.length(); i++) {
      if ("aeiou".indexOf(lower.charAt(i)) >= 0) {
        n++;
      }
    }
    return n;
  }
}
