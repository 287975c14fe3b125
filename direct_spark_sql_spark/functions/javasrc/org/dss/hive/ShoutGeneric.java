package org.dss.hive;

import org.apache.hadoop.hive.ql.exec.UDFArgumentException;
import org.apache.hadoop.hive.ql.metadata.HiveException;
import org.apache.hadoop.hive.ql.udf.generic.GenericUDF;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory;
import org.apache.hadoop.io.Text;

/**
 * Hive GenericUDF (the ObjectInspector-based API the reference's catalog
 * also accepts, DirectSessionCatalog.scala:72-91): uppercases a string and
 * appends '!'.  Exercises the initialize/evaluate/DeferredObject protocol
 * rather than reflective dispatch.
 */
public class ShoutGeneric extends GenericUDF {
    @Override
    public ObjectInspector initialize(ObjectInspector[] args) throws UDFArgumentException {
        if (args.length != 1) {
            throw new UDFArgumentException("shout takes exactly one argument");
        }
        return PrimitiveObjectInspectorFactory.writableStringObjectInspector;
    }

    @Override
    public Object evaluate(DeferredObject[] args) throws HiveException {
        Object o = args[0].get();
        if (o == null) {
            return null;
        }
        return new Text(o.toString().toUpperCase() + "!");
    }

    @Override
    public String getDisplayString(String[] children) {
        return "shout(" + String.join(", ", children) + ")";
    }
}
