package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for CPU-heavy narrow kernels (signature /
  * shingle / sketch maps): a small or upstream-coalesced source can expose
  * a handful of partitions (one 600 KB parquet file = ONE task), which
  * serializes the kernel on one core while the rest of the executor fleet
  * idles — measured as the dominant cost of the ANN/minhash bench queries
  * at sf0.1 (single-task stages of 1.5 s CPU on a 32-core session).
  *
  * `Spread(df)` round-robins to the session's default parallelism ONLY when
  * the source has materially fewer partitions; at production scale (inputs
  * already split into many files/partitions) it is the identity and adds no
  * exchange — PlanSpec asserts both behaviors.
  */
private[graft] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Probe with .rdd ONLY on shuffle-free plans. Under AQE, .rdd on a
    // plan containing an exchange materializes the upstream shuffle/
    // broadcast stages at DataFrame-construction time (the probe runs the
    // map jobs) and the real query re-plans and runs them AGAIN — doubling
    // the upstream cost just to count partitions. The exchanges are only
    // inserted inside AdaptiveSparkPlanExec (invisible to a physical-plan
    // walk before execution), so detect shuffle-INDUCING operators on the
    // optimized logical plan instead. Such a plan is already at session
    // shuffle width (or a width the caller chose) — Spread is the identity
    // there; on a scan-narrow plan, building the RDD runs no job and the
    // split count is the real source parallelism.
    import org.apache.spark.sql.catalyst.plans.logical._
    val mayShuffle = df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Deduplicate | _: Window | _: Sort => true
      case _: RepartitionOperation | _: SetOperation => true
      case _ => false
    }
    if (mayShuffle) df
    else if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target)
    else df
  }
}
