package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule must turn a naive BETWEEN join into a
  * bucketed equi-join (hash join on the synthetic bucket) and produce
  * identical results to the unoptimized plan.
  */
class RangeJoinRuleSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark => base}

  private def withExtSession[T](f: SparkSession => T): T = {
    val old = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try f(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions).getOrCreate())
    finally {
      SparkSession.clearActiveSession()
      old.foreach { s => SparkSession.setDefaultSession(s); SparkSession.setActiveSession(s) }
    }
  }

  test("BETWEEN join rewrites to a bucketed hash join with equal results") {
    // expected result computed on the plain session (no rule)
    val expected = {
      val orders = Tables(base, sf).orders
      val bands = base.range(0, 20).select(
        col("id").as("band"),
        (col("id") * col("id") * 2000).as("lo"),
        ((col("id") + 1) * (col("id") + 1) * 2000).as("hi"))
      orders.join(bands, col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("band")).count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    withExtSession { s =>
      val orders = Tables(s, sf).orders
      val bands = s.range(0, 20).select(
        col("id").as("band"),
        (col("id") * col("id") * 2000).as("lo"),
        ((col("id") + 1) * (col("id") + 1) * 2000).as("hi"))
      val joined = orders
        .join(bands, col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_bucket"), s"rule did not fire:\n$optimized")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin"), s"still BNLJ:\n$physical")
      val got = joined.groupBy(col("band")).count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected, s"result drift: got=$got expected=$expected")
    }
  }

  test("rule handles extra conjuncts in the join condition") {
    withExtSession { s =>
      val orders = Tables(s, sf).orders
      val bands = s.range(0, 20).select(
        col("id").as("band"),
        (col("id") * col("id") * 2000).as("lo"),
        ((col("id") + 1) * (col("id") + 1) * 2000).as("hi"))
      val joined = orders.join(
        bands,
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi") &&
          col("band") % 2 === 0)
      assert(joined.queryExecution.optimizedPlan.toString.contains("__graft_bucket"),
        "rule did not fire with residual conjunct")
      val expected = Tables(SparkTestSession.spark, sf).orders.join(
        SparkTestSession.spark.range(0, 20).select(
          col("id").as("band"),
          (col("id") * col("id") * 2000).as("lo"),
          ((col("id") + 1) * (col("id") + 1) * 2000).as("hi")),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi") &&
          col("band") % 2 === 0).count()
      assert(joined.count() == expected)
    }
  }

  test("rule is correct for negative range bounds (floor vs truncate division)") {
    withExtSession { s =>
      import s.implicits._
      // values straddling zero; intervals with negative lo
      val facts = Seq(-2500.0, -1500.0, -100.0, 0.0, 100.0, 1500.0).toDF("v")
      val bands = Seq((0L, -2000L, -1000L), (1L, -1000L, 1000L), (2L, 1000L, 2000L))
        .toDF("band", "lo", "hi")
      val joined = facts.join(bands, col("v") >= col("lo") && col("v") < col("hi"))
      assert(joined.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
      val got = joined.select("v", "band").collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
      val expected = Set((-1500.0, 0L), (-100.0, 1L), (0.0, 1L), (100.0, 1L), (1500.0, 2L))
      assert(got == expected, s"got $got")
    }
  }

  test("rule leaves non-range joins untouched") {
    withExtSession { s =>
      val o = Tables(s, sf).orders
      val c = Tables(s, sf).customer
      val j = o.join(c, col("o_custkey") === col("c_custkey"))
      assert(!j.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
      assert(j.count() > 0)
    }
  }
}
