package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions deployment path: a session built with
  * GraftExtensions exposes the codegen'd functions to pure SQL.
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions registers graft_dot/graft_agree/graft_murmur2 for SQL") {
    val base = spark // force the shared session/context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same SparkContext, new session state with the extensions applied
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne base)
      assert(s.sql("SELECT graft_agree(array(1,2,3,4), array(1,0,3,9))").head().getInt(0) == 2)
      assert(s.sql("SELECT graft_dot(array(1.0d,2.0d), array(3.0d,4.0d))").head().getDouble(0) == 11.0)
      // golden murmur2 vector (FIXTURES.md §2: "hello", seed 0 -> 3848350155;
      // the expression returns the unsigned value as a long)
      assert(s.sql("SELECT graft_murmur2('hello', 0)").head().getLong(0) == 3848350155L)
      // arity misuse is a clean error, not a planner crash
      intercept[Exception](s.sql("SELECT graft_agree(array(1))").head())
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
