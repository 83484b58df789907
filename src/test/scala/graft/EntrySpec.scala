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
}
