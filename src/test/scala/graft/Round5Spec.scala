package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Round-5 additions: the result-blind instrument gate and budget
  * truncation in the scaling harness (VERDICT r4 #1/#3), and the two-level
  * IVF assignment (VERDICT r4 #6 — the flat broadcast argmax is
  * O(N*nCells), which under the nCells ~ sqrt(N) schedule makes the
  * ASSIGNMENT the dominant job at extreme scale).
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  // --- result-blind retry decision (ADVICE r4 / VERDICT r4 #3) -----------

  test("instrument gate is keyed only on instrument quality, never the result") {
    // clean instrument -> ship without retry (whatever efficiency measured)
    assert(ScalingBench.instrumentClean(ceilingDirty = false, hostCeiling = 0.95,
      weatherDirtyFrac = 0.0, ceilBar = 0.9))
    assert(ScalingBench.instrumentClean(ceilingDirty = false, hostCeiling = 0.9,
      weatherDirtyFrac = 0.33, ceilBar = 0.9))
    // degraded instrument -> retry, even when the measurement LOOKED fine
    assert(!ScalingBench.instrumentClean(ceilingDirty = true, hostCeiling = 0.95,
      weatherDirtyFrac = 0.0, ceilBar = 0.9)) // steal-dirty ceiling calibration
    assert(!ScalingBench.instrumentClean(ceilingDirty = false, hostCeiling = 0.85,
      weatherDirtyFrac = 0.0, ceilBar = 0.9)) // same-minute ceiling below bar
    assert(!ScalingBench.instrumentClean(ceilingDirty = false, hostCeiling = 0.95,
      weatherDirtyFrac = 0.5, ceilBar = 0.9)) // majority-ish weather-dirty samples
    // bar 0 disables the gate (the stress pair is judged vs its own ceiling)
    assert(ScalingBench.instrumentClean(ceilingDirty = true, hostCeiling = 0.1,
      weatherDirtyFrac = 1.0, ceilBar = 0.0))
  }

  test("budget-truncated probes ship flagged in both JSON forms") {
    val r = ScalingBench.Result("window_features_asof", 1000, 1000, 10.0, 3.0,
      smallRaw = Seq(10.0), bigRaw = Seq(3.0), truncated = true)
    assert(r.json.contains("\"truncated\":true"))
    assert(r.compactJson.contains("\"truncated\":true"))
    val full = r.copy(truncated = false)
    assert(!full.json.contains("truncated") && !full.compactJson.contains("truncated"))
    // absolute gauge bests ship in the full JSON, so an all-degraded run is
    // detectable downstream even though per-sample weather is relative
    assert(r.json.contains("\"gauge_best_copy\":"))
    assert(r.json.contains("\"gauge_best_boost\":"))
  }

  // --- two-level IVF assignment ------------------------------------------

  // same deterministic clustered corpus as Round4Spec: 120 vectors in 24
  // id-DIV-5 clusters; centroidGap = 5 puts each of the 8 centroids in a
  // distinct cluster
  private lazy val ivfCorpus = spark.range(120)
    .select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), j -> CAST(CAST(pmod(xxhash64(id DIV 5, j), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))")
        .as("embedding"))

  private def assignMap(nSuper: Int): Map[Long, Long] =
    Similarity.ivfAssign(ivfCorpus, "vec_id", "embedding", 8, 5L, nSuper)
      .as[(Long, Long)].collect().toMap

  test("two-level IVF: nSuper == 1 and nSuper == nCells reproduce the flat assignment") {
    val flat = assignMap(1)
    assert(flat.size == 120)
    // nSuper == nCells: every centroid is its own (only) child, so routing
    // IS the global argmax — must equal flat exactly
    assert(assignMap(8) == flat)
  }

  test("two-level IVF routing (nSuper = 4) matches a driver-side reference") {
    // independent reference: replicate VectorOps.dotDouble's strict
    // left-to-right double accumulation and the (cos desc, id asc)
    // tie-break on collected rows
    val rows = ivfCorpus.as[(Long, Array[Float])].collect().toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        acc += a(i).toDouble * b(i).toDouble; i += 1
      }
      acc
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    val cents = (0 until 8).map(i => (i.toLong, rows(i * 5L))) // (idx, vec)
    def argmax(cands: Seq[(Long, Array[Float])], v: Array[Float]): Long =
      cands.map { case (id, c) => (cos(v, c), id) }
        .maxBy { case (s, id) => (s, -id) }._2
    val expected = rows.map { case (id, v) =>
      val sid = argmax(cents.take(4), v)                    // route: 4 supers
      val children = cents.filter(_._1 % 4 == sid)          // their children
      id -> argmax(children, v) * 5L                        // cell = centroid id
    }
    assert(assignMap(4) == expected)
  }

  test("two-level IVF search with nProbe == nCells still equals brute force") {
    // whatever the (approximate) routing did, probing every cell recovers
    // the exact result — the anchor holds for the two-level index too
    val brute = Similarity.cosineKnnBrute(ivfCorpus, "vec_id", "embedding",
      "vec_id % 11 = 0", 3)
      .select("qid", "nid", "rank").as[(Long, Long, Long)].collect().toSet
    val ivf = Similarity.cosineKnnIvf(ivfCorpus, "vec_id", "embedding",
      "vec_id % 11 = 0", 3, nCells = 8, nProbe = 8, centroidGap = 5L, nSuper = 4)
      .select("qid", "nid", "rank").as[(Long, Long, Long)].collect().toSet
    assert(ivf == brute)
  }

  test("two-level IVF: every vector lands in exactly one existing cell") {
    val assign = assignMap(4)
    assert(assign.size == 120)
    val validCids = (0 until 8).map(_ * 5L).toSet
    assert(assign.values.toSet.subsetOf(validCids))
    // SUPER-centroids self-assign (they route to themselves at cos = 1 and
    // are their own child). A non-super centroid may legitimately land
    // elsewhere — its nearest super need not be the one that owns it under
    // the modular grouping; that approximation is the coarse-quantizer
    // trade the reference-match test above pins exactly.
    (0 until 4).map(_ * 5L).foreach(cid =>
      assert(assign(cid) == cid, s"super-centroid $cid must self-assign"))
  }
}
