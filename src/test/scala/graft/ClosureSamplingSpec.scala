package graft

import graft.ops.{Closure, Sampling}
import org.apache.spark.sql.functions._

class ClosureSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("parent closure resolves multi-level chains to roots") {
    // chain 1<-2<-3<-4<-5, root 10 (self), dangling parent 99 for 20
    val edges = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L),
      (10L, 10L), (20L, 99L)).toDF("id", "parent")
    val got = Closure.resolveRoots(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 20L -> 99L), "dangling parent resolves to the absent value (self-fallback)")
  }

  test("null parent falls back to self (core.rs:162-168)") {
    val edges = Seq((1L, Some(1L)), (2L, None), (3L, Some(2L)))
      .toDF("id", "parent")
    val got = Closure.resolveRoots(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("stratified sample keeps ceil(ratio*n) per stratum, deterministic") {
    val df = (0 until 100).map(i => (s"s${i % 3}", i.toLong)).toDF("entity", "group_id")
    val s1 = Sampling.stratifiedGroupSample(df, "entity", "group_id", 0.1)
      .as[(String, Long)].collect().toSet
    val s2 = Sampling.stratifiedGroupSample(df.repartition(7), "entity", "group_id", 0.1)
      .as[(String, Long)].collect().toSet
    assert(s1 == s2, "deterministic across partitionings")
    val perStratum = s1.groupBy(_._1).map { case (k, v) => k -> v.size }
    // strata sizes: s0=34, s1=33, s2=33 -> ceil(0.1*n) = 4, 4, 4
    assert(perStratum == Map("s0" -> 4, "s1" -> 4, "s2" -> 4))
  }
}
