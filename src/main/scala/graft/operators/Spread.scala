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
    // .rdd builds the physical plan to count source splits; it runs no job
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }
}
