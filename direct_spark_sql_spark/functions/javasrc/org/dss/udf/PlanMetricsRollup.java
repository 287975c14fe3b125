package org.dss.udf;

import org.apache.spark.sql.execution.SparkPlan;
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec;
import org.apache.spark.sql.execution.adaptive.QueryStageExec;
import org.apache.spark.sql.execution.metric.SQLMetric;

/**
 * JVM-side executed-plan metric rollup.
 *
 * The bench's shuffle/spill regression gate needs the sum of one
 * SQLMetric over every node of an executed plan (descending through AQE
 * roots and query stages so the post-reoptimization operators are what is
 * counted, and skipping SQLMetric's -1 "unset" sentinel — the exact
 * semantics of session._walk_plan_metrics).  Walking the plan from Python
 * costs thousands of py4j round trips per query (measured 1-11 s per
 * query at round 13, starving the bench's probe tiers out of its wall
 * budget); this class does the identical walk in one call.
 *
 * Instance methods rather than statics so the caller can load the class
 * through the session's context classloader (ADD JAR classes are not
 * visible to the py4j gateway's root classloader) and dispatch plainly on
 * the instance.
 */
public class PlanMetricsRollup {

    public PlanMetricsRollup() {}

    /** Sum of {@code key} over all nodes of {@code planObj} (a SparkPlan),
     *  counting only values &gt; 0. */
    public long sumMetric(Object planObj, String key) {
        return walk((SparkPlan) planObj, key);
    }

    private long walk(SparkPlan plan, String key) {
        long total = 0L;
        scala.Option<?> m = plan.metrics().get(key);
        if (m.isDefined()) {
            long v = ((SQLMetric) m.get()).value();
            if (v > 0L) {
                total += v;
            }
        }
        if (plan instanceof AdaptiveSparkPlanExec) {
            total += walk(((AdaptiveSparkPlanExec) plan).executedPlan(), key);
        } else if (plan instanceof QueryStageExec) {
            total += walk(((QueryStageExec) plan).plan(), key);
        }
        scala.collection.Iterator<?> it = plan.children().iterator();
        while (it.hasNext()) {
            total += walk((SparkPlan) it.next(), key);
        }
        return total;
    }
}
