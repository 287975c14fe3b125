package org.dss.hive;

import java.util.ArrayList;
import java.util.List;
import org.apache.hadoop.hive.ql.exec.UDFArgumentException;
import org.apache.hadoop.hive.ql.metadata.HiveException;
import org.apache.hadoop.hive.ql.udf.generic.GenericUDTF;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.PrimitiveObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.StructObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory;

/**
 * Hive GenericUDTF (the table-function contract the reference's catalog
 * registers, DirectSessionCatalog.scala:78-91): splits a comma-separated
 * string into (pos, token) rows.  Exercises the initialize/process/
 * forward protocol through the engine's CREATE FUNCTION surface (used
 * with LATERAL VIEW in tests/test_hive_udf.py).
 */
public class ExplodeCsv extends GenericUDTF {
    private transient PrimitiveObjectInspector inputOI;
    private final Object[] forwardBuf = new Object[2];

    @Override
    public StructObjectInspector initialize(ObjectInspector[] argOIs) throws UDFArgumentException {
        if (argOIs.length != 1) {
            throw new UDFArgumentException("explode_csv takes exactly one argument");
        }
        if (!(argOIs[0] instanceof PrimitiveObjectInspector)) {
            throw new UDFArgumentException(
                "explode_csv takes a primitive (string) argument, got "
                + argOIs[0].getTypeName());
        }
        inputOI = (PrimitiveObjectInspector) argOIs[0];
        List<String> names = new ArrayList<>();
        names.add("pos");
        names.add("token");
        List<ObjectInspector> ois = new ArrayList<>();
        ois.add(PrimitiveObjectInspectorFactory.javaIntObjectInspector);
        ois.add(PrimitiveObjectInspectorFactory.javaStringObjectInspector);
        return ObjectInspectorFactory.getStandardStructObjectInspector(names, ois);
    }

    @Override
    public void process(Object[] args) throws HiveException {
        if (args[0] == null) {
            return;
        }
        String s = String.valueOf(inputOI.getPrimitiveJavaObject(args[0]));
        String[] tokens = s.split(",", -1);
        for (int i = 0; i < tokens.length; i++) {
            forwardBuf[0] = i;
            forwardBuf[1] = tokens[i];
            forward(forwardBuf);
        }
    }

    @Override
    public void close() {
    }
}
