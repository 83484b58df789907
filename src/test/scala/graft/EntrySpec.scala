package graft

/** Driver-contract smoke: the flagship entry returns rows, every registered
  * query runs at sf0.001, and every oracle key has a matching query.
  */
class EntrySpec extends SparkSpec {

  test("entry() returns > 0 rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, missing.toString)
  }

  test("oracle SQL mentions every Spark output column (rename-drift guard)") {
    // the driver hash-compares columns SORTED BY NAME — a Spark-side alias
    // the SQL doesn't carry hash-mismatches even with identical values.
    // Plan-only check: building the frame never executes it.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val cols = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").columns
      // whole-word match: bare substring containment would let a column
      // named `sim` ride on the SQL's `similarity`
      val missing = cols.filterNot(c =>
        ("\\b" + java.util.regex.Pattern.quote(c) + "\\b").r.findFirstIn(sql).isDefined)
      assert(missing.isEmpty, s"$name: oracle SQL lacks columns ${missing.mkString(",")}")
    }
  }

  test("all queries run at sf0.001 and return rows") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with 0 rows: $empty")
  }

  test("driver-facing query outputs are scalar-only (pandas-sortable)") {
    // The driver sorts each committed output with pandas sort_values, which
    // throws `unhashable type: numpy.ndarray` on array cells — round 6
    // shipped 8 CORRECTNESS rows as `err` exactly this way. Array-bearing
    // frames belong in SparkEntry.artifacts (_artifact_* dirs the driver
    // never compares). Plan-only: building the frame never executes it —
    // except q_streaming_dedup, whose builder runs its (tiny) job.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val nonScalar = fn(spark, "/root/testdata/sf0.001").schema.fields.filter {
        f => f.dataType match {
          case _: ArrayType | _: MapType | _: StructType => true
          case _ => false
        }
      }
      if (nonScalar.isEmpty) None
      else Some(s"$name: ${nonScalar.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")}")
    }
    assert(bad.isEmpty, s"non-scalar driver-facing columns:\n${bad.mkString("\n")}")
  }

  test("artifact frames run at sf0.001, return rows, and carry arrays") {
    // each _artifact_* frame is a replay substrate: it must be nonempty and
    // is EXPECTED to carry at least one array column (else it belongs in
    // queries where the driver can compare it)
    import org.apache.spark.sql.types.ArrayType
    SparkEntry.artifacts.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.exists(_.dataType.isInstanceOf[ArrayType]),
        s"artifact $name carries no array column")
      assert(df.count() > 0, s"artifact $name is empty at sf0.001")
    }
  }

  test("no oracle reads a q_* path that the artifacts now own") {
    // @GRAFT_OUT@ reads must point either at a committed DRIVER-COMPARED
    // query dir (q_*) that still exists in `queries`, or at an
    // _artifact_* dir that exists in `artifacts`
    val re = "@GRAFT_OUT@/([A-Za-z0-9_]+)/".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      re.findAllMatchIn(sql).map(_.group(1)).foreach { target =>
        if (target.startsWith("_artifact_"))
          assert(SparkEntry.artifacts.contains(target.stripPrefix("_artifact_")),
            s"$name reads unknown artifact $target")
        else
          assert(SparkEntry.queries.contains(target),
            s"$name reads unknown query output $target")
      }
    }
  }
}
