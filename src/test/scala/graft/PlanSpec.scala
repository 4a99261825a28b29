package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates: the scale properties SURVEY §5 claims
  * must be visible in the plans, not just intended. */
class PlanSpec extends AnyFunSuite {
  import TestSession._

  private def plan(name: String): String = {
    import org.apache.spark.sql.execution.ExplainMode
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
  }

  test("q2: predicate and projection reach the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"),
      s"filters not pushed:\n${p.take(800)}")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double"),
      "scan reads more columns than the projection needs")
  }

  test("q6: tight range filters pushed to scan") {
    val p = plan("q6_cond_agg")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)") &&
      p.contains("LessThan(l_quantity,24.0)"))
  }

  test("q5: star join is all-broadcast at this SF (no sort-merge join)") {
    val p = plan("q5_multijoin")
    assert(!p.contains("SortMergeJoin"), "dim join fell back to SMJ")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4)
  }

  test("q15: global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan("q15_topk_order")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("x8: bucketed fact-fact join has no shuffle exchange") {
    val p = graft.operators.Engine.x8Plan(spark, sf)
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${p.take(1200)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
  }
}
