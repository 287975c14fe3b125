package org.dss.hive;

import org.apache.hadoop.hive.ql.exec.UDF;

/**
 * Hive-API simple UDF with overloaded evaluate methods — the port of the
 * reference suite's StrLen test class (DirectExecSuite.scala:385-393):
 * string input returns its length, int input returns input + 100, so a
 * query exercising both overloads proves Hive's reflective method
 * dispatch works through the engine's CREATE FUNCTION surface.
 */
public class StrLen extends UDF {
    public Integer evaluate(String input) {
        if (input == null) {
            return null;
        }
        return input.length();
    }

    public Integer evaluate(Integer input) {
        if (input == null) {
            return null;
        }
        return input + 100;
    }
}
