package graft

import graft.ops.Coverage
import org.apache.spark.sql.functions._

/** Interval-union == brute-force bitmap length; touching intervals merge
  * (reference: coverage.rs:92-121); depth == exact distinct count.
  */
class CoverageSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(3)
  private val ivs: Seq[(String, Long, Long, Long)] = (0 until 400).map { i =>
    val s = rnd.nextInt(2000).toLong
    (if (i % 2 == 0) "g1" else "g2", s, s + 1 + rnd.nextInt(50), i.toLong)
  }

  test("unionLength == brute-force bitmap") {
    val got = Coverage.unionLength(ivs.toDF("k", "start", "end", "id"), Seq("k"),
      orderTiebreak = Seq("id"))
      .select("k", "covered").as[(String, Long)].collect().toMap
    for (k <- Seq("g1", "g2")) {
      val bitmap = Array.fill(4000)(false)
      ivs.filter(_._1 == k).foreach { case (_, s, e, _) =>
        (s until e).foreach(i => bitmap(i.toInt) = true) }
      assert(got(k) == bitmap.count(identity).toLong)
    }
  }

  test("touching intervals merge into one island") {
    val df = Seq(("k", 0L, 5L, 1L), ("k", 5L, 9L, 2L), ("k", 20L, 30L, 3L))
      .toDF("k", "start", "end", "id")
    val r = Coverage.unionLength(df, Seq("k"), orderTiebreak = Seq("id"))
      .select("covered", "n_islands").as[(Long, Long)].head()
    assert(r == ((19L, 2L)))
  }

  test("depth == exact distinct probe count including duplicate hits") {
    val pairs = Seq((1L, 10L), (1L, 10L), (1L, 11L), (2L, 10L))
      .toDF("fid", "probe_id")
    val got = Coverage.depth(pairs, "fid", "probe_id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }
}
