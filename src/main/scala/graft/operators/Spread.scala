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
    import org.apache.spark.sql.catalyst.plans.logical._
    val plan = df.queryExecution.optimizedPlan
    // An explicit caller repartition is a width the caller CHOSE — never
    // second-guess it, and never probe it (.rdd under AQE would run the
    // repartition's map stage at construction time just to count splits).
    if (plan.exists(_.isInstanceOf[RepartitionOperation])) return df
    // Probe with .rdd ONLY on provably narrow plans (ALLOWLIST, not a
    // denylist: GlobalLimit, MapGroups, script transforms etc. all induce
    // exchanges, and under AQE .rdd materializes those shuffle stages at
    // DataFrame-construction time — the real query then re-plans and runs
    // them AGAIN, doubling the upstream cost just to count partitions).
    // On a narrow chain, building the RDD runs no job and the split count
    // is the real source parallelism.
    val narrowOnly = !plan.exists {
      case _: LeafNode | _: Project | _: Filter | _: Generate | _: Union => false
      case _: SerializeFromObject | _: DeserializeToObject => false
      case _: MapElements | _: MapPartitions | _: TypedFilter => false
      case _ => true // anything not provably narrow
    }
    if (narrowOnly) {
      if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
    } else {
      // Shuffle-bearing plan: nominally at session shuffle width, but AQE
      // coalesces a SMALL shuffle output toward advisoryPartitionSizeInBytes
      // — a tiny aggregated/deduped corpus would then feed the CPU-heavy
      // kernel as 1-2 tasks (the exact pathology Spread exists for). Decide
      // on the JOB-FREE logical size estimate, calibrated to THIS session's
      // AQE settings: spread outputs that would coalesce below ~target/2
      // partitions; leave genuinely large plans untouched (identity at
      // production scale — an overestimated stat degrades to the old
      // identity behavior, never to extra shuffles on big data). With AQE
      // coalescing off the pathology doesn't exist: identity.
      val conf = df.sparkSession.conf
      def bytesConf(key: String, dflt: String): Long =
        try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(conf.get(key, dflt))
        catch { case _: NumberFormatException =>
          org.apache.spark.network.util.JavaUtils.byteStringAsBytes(dflt) }
      val coalescing =
        conf.get("spark.sql.adaptive.enabled", "true").toBoolean &&
          conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true").toBoolean
      if (!coalescing) df
      else {
        // The per-partition floor AQE actually coalesces toward depends on
        // parallelismFirst (default true): then the target size is
        // max(total/parallelism, minPartitionSize) — the ADVISORY size is
        // ignored and only minPartitionSize can push partitions below full
        // parallelism. Only with parallelismFirst=false does the advisory
        // size drive coalescing. Post-shuffle partitions fall under
        // ~target/2 iff estimated bytes < floor × target/2.
        val floorBytes =
          if (conf.get("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true").toBoolean)
            bytesConf("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1MB")
          else
            bytesConf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
        if (plan.stats.sizeInBytes < BigInt(floorBytes) * math.max(1, target / 2))
          df.repartition(target)
        else df
      }
    }
  }
}
