package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks over the whole registry: unique names, every query runs
  * at sf0.001, oracle column names line up with the Spark output (the
  * driver's compare sorts columns by name — a mismatch silently fails the
  * hash), and the flagship entry returns rows.
  */
class RegistrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("query names are unique and every query has a fn") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle's SELECT list matches the Spark plan's columns") {
    // cheap structural check: each Spark output column name must appear
    // verbatim in the oracle SQL text (aliases are spelled identically)
    Registry.all.filter(_.oracle.isDefined).foreach { q =>
      val cols = q.fn(spark, TestSpark.sf0001).columns
      val sql = q.oracle.get.toLowerCase
      cols.foreach { c =>
        assert(sql.contains(c.toLowerCase), s"${q.name}: column $c not in oracle SQL")
      }
    }
  }

  test("every registered query runs at sf0.001") {
    val failures = Registry.all.flatMap { q =>
      try { q.fn(spark, TestSpark.sf0001).count(); None }
      catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
