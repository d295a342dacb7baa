package graft

import graft.model.Synth
import graft.ops.{Closure, IntervalJoin, Overlap, Similarity}
import org.apache.spark.sql.functions._

/** Round-3 additions: closure cache release, ANN multi-probe recall,
  * skewed-input join-path equality.
  */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  test("resolveRootsReleasable: correct roots, and release() leaves no cached data behind") {
    // depth-3 chains + a self-root + a dangling parent
    val edges = (Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 2L), (4L, 99L)) ++
      (10L until 40L).map(i => (i, i - 10)))
      .toDF("id", "parent")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (roots, release) = Closure.resolveRootsReleasable(edges)
    val m = roots.as[(Long, Long)].collect().toMap
    assert(m(3L) == 0L && m(2L) == 0L && m(0L) == 0L)
    assert(m(4L) == 99L, "dangling parent resolves to the pointer itself")
    assert(m(30L) == 0L || m(30L) == 10L % 10, "chain resolves to its head")
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty, "the closure rounds should have materialized caches")
    release()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.intersect(during)
    assert(leaked.isEmpty,
      s"closure rounds must not leave cached RDDs after release(): $leaked")
  }

  test("ANN multi-probe recall >= single-probe recall against the exact baseline") {
    // deterministic pseudo-embeddings with planted near-duplicates
    val base = spark.range(300)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(0, 15), j -> CAST(CAST(pmod(xxhash64(id DIV 3, j), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))")
          .as("embedding"))
    def hits(multi: Boolean): Long = {
      val brute = Similarity.cosineKnnBrute(base, "vec_id", "embedding", "vec_id % 10 = 0", 3)
        .select("qid", "nid")
      val lsh = Similarity.cosineKnnLshBanded(base, "vec_id", "embedding",
        "vec_id % 10 = 0", 3, bandBits = 4, nBands = 6, dim = 16, multiProbe = multi)
        .select("qid", "nid")
      brute.join(lsh, Seq("qid", "nid"), "left_semi").count()
    }
    val single = hits(multi = false)
    val multi = hits(multi = true)
    assert(multi >= single,
      s"Hamming-1 probing widens the candidate set, never narrows it ($multi vs $single)")
    assert(multi > 0)
  }

  test("skewed hot-entity input: binned and entity-hash sweep paths agree exactly") {
    val probes = Synth.skewedProbes(spark, 20000, nEntities = 16)
    val feats = Synth.featureIntervals(spark, 5000, nEntities = 16)
      .drop("group_id", "ftype", "attr")
    def rows(binSize: Long): Set[Seq[Any]] =
      IntervalJoin.sweepJoin(probes, feats, Overlap, binSize)
        .collect().map(_.toSeq).toSet
    val binned = rows(4096L)
    val entityHash = rows(1L << 40) // degenerate: one bin per entity
    assert(binned == entityHash)
    assert(binned.nonEmpty)
    // the fixture really is skewed: >= 40% of probe rows on one entity
    val hot = probes.groupBy("entity").count().orderBy(col("count").desc)
      .limit(1).as[(String, Long)].collect()(0)
    assert(hot._1 == "e00" && hot._2 >= 8000, s"hot entity: $hot")
  }
}
