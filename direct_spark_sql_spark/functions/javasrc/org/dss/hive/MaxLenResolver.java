package org.dss.hive;

import org.apache.hadoop.hive.ql.metadata.HiveException;
import org.apache.hadoop.hive.ql.parse.SemanticException;
import org.apache.hadoop.hive.ql.udf.generic.AbstractGenericUDAFResolver;
import org.apache.hadoop.hive.ql.udf.generic.GenericUDAFEvaluator;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.PrimitiveObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorUtils;
import org.apache.hadoop.hive.serde2.typeinfo.TypeInfo;
import org.apache.hadoop.io.IntWritable;

/**
 * Hive generic UDAF resolver ({@code AbstractGenericUDAFResolver} — the
 * modern UDAF contract the reference's catalog accepts,
 * DirectSessionCatalog.scala:78-91): max string length over a group,
 * implemented with the full GenericUDAFEvaluator mode protocol
 * (PARTIAL1 string-&gt;int, FINAL int-&gt;int), so partial aggregation /
 * merge across partitions is genuinely exercised.
 */
public class MaxLenResolver extends AbstractGenericUDAFResolver {
    @Override
    public GenericUDAFEvaluator getEvaluator(TypeInfo[] info) throws SemanticException {
        return new MaxLenEvaluator();
    }

    public static class MaxLenEvaluator extends GenericUDAFEvaluator {
        private transient PrimitiveObjectInspector inputOI;

        @Override
        public ObjectInspector init(Mode m, ObjectInspector[] parameters) throws HiveException {
            super.init(m, parameters);
            // PARTIAL1/COMPLETE see the raw string column; PARTIAL2/FINAL
            // see the int partial.  Either way it's a primitive OI and the
            // partial/final output is an int.
            inputOI = (PrimitiveObjectInspector) parameters[0];
            return PrimitiveObjectInspectorFactory.writableIntObjectInspector;
        }

        static class MaxBuf extends AbstractAggregationBuffer {
            boolean set;
            int max;
        }

        @Override
        public AggregationBuffer getNewAggregationBuffer() {
            return new MaxBuf();
        }

        @Override
        public void reset(AggregationBuffer agg) {
            ((MaxBuf) agg).set = false;
            ((MaxBuf) agg).max = 0;
        }

        @Override
        public void iterate(AggregationBuffer agg, Object[] parameters) throws HiveException {
            if (parameters[0] == null) {
                return;
            }
            String s = PrimitiveObjectInspectorUtils.getString(parameters[0], inputOI);
            if (s != null) {
                update((MaxBuf) agg, s.length());
            }
        }

        @Override
        public Object terminatePartial(AggregationBuffer agg) {
            return terminate(agg);
        }

        @Override
        public void merge(AggregationBuffer agg, Object partial) throws HiveException {
            if (partial != null) {
                update((MaxBuf) agg, PrimitiveObjectInspectorUtils.getInt(partial, inputOI));
            }
        }

        @Override
        public Object terminate(AggregationBuffer agg) {
            MaxBuf buf = (MaxBuf) agg;
            return buf.set ? new IntWritable(buf.max) : null;
        }

        private static void update(MaxBuf buf, int len) {
            buf.max = buf.set ? Math.max(buf.max, len) : len;
            buf.set = true;
        }
    }
}
