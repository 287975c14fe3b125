package org.dss.hive;

import org.apache.hadoop.hive.ql.exec.UDAF;
import org.apache.hadoop.hive.ql.exec.UDAFEvaluator;

/**
 * Hive old-style UDAF (the {@code org.apache.hadoop.hive.ql.exec.UDAF}
 * contract the reference's catalog registers alongside resolvers,
 * DirectSessionCatalog.scala:78-91): max string length over a group.
 * Exercises Hive's reflective iterate/terminatePartial/merge/terminate
 * dispatch through the engine's CREATE FUNCTION surface.
 */
public class MaxLenUdaf extends UDAF {
    public static class MaxLenEvaluator implements UDAFEvaluator {
        private Integer max;

        public MaxLenEvaluator() {
            init();
        }

        @Override
        public void init() {
            max = null;
        }

        public boolean iterate(String value) {
            if (value != null) {
                max = (max == null) ? value.length() : Math.max(max, value.length());
            }
            return true;
        }

        public Integer terminatePartial() {
            return max;
        }

        public boolean merge(Integer other) {
            if (other != null) {
                max = (max == null) ? other : Math.max(max, other);
            }
            return true;
        }

        public Integer terminate() {
            return max;
        }
    }
}
