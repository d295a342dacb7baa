package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.collection.mutable.ArrayBuffer

/** Overlap modes, mirroring the reference's three region-query modes
  * (reference: src/commands/intersect.rs:144-158).
  *  - Overlap:        any intersection (half-open: f.start < p.end && f.end > p.start)
  *  - Contained:      feature fully inside the probe region
  *  - ContainsRegion: feature fully covers the probe region
  */
sealed trait OverlapMode
case object Overlap extends OverlapMode
case object Contained extends OverlapMode
case object ContainsRegion extends OverlapMode

/** The engine's flagship operator: distributed interval join
  * (reference: per-seqid centered interval-tree probe, src/utils/tree.rs:96-121
  * + driver src/commands/intersect.rs:104-169 — re-expressed Spark-first).
  *
  * Column convention: BOTH inputs carry (`entity`, `start`, `end`) plus
  * arbitrary payload columns (names must not collide across sides).
  * Output: `entity, p_start, p_end, <probe payload>, f_start, f_end,
  * <feature payload>`.
  *
  * Three physical paths (SURVEY.md §4 decision tree):
  *  1. [[broadcastJoin]] — annotation side small: broadcast per-entity
  *     [[IntervalIndex]] (≙ the reference's in-memory tree), probe-side
  *     mapPartitions, zero shuffle of the big side.
  *  2. [[binnedJoin]] — both sides big and/or hot-entity skew: explode into
  *     fixed-width coordinate bins and equi-join on (entity, bin); Catalyst
  *     plans a plain shuffled hash/sort-merge equi-join with whole-stage
  *     codegen; the "emit only in the intersection-start bin" trick makes
  *     output exactly-once with NO dedup shuffle. This is also the skew
  *     salting template (reference: src/commands/depth.rs:29-31,162-207 —
  *     a hot entity's rows spread across all its bins).
  *  3. [[sweepJoin]] — both sides big, entity cardinality >= parallelism:
  *     tag-union + repartition(entity) + sortWithinPartitions + single-pass
  *     plane sweep in typed mapPartitions, O(n+m+k) per partition
  *     (reference: two-pointer sweep, src/commands/coverage.rs:336-362).
  */
object IntervalJoin {

  /** Exact overlap predicate for a mode, over prepped column names. */
  def predicate(mode: OverlapMode): Column = mode match {
    case Overlap =>
      col("f_start") < col("p_end") && col("f_end") > col("p_start")
    case Contained =>
      col("f_start") >= col("p_start") && col("f_end") <= col("p_end")
    case ContainsRegion =>
      col("f_start") <= col("p_start") && col("f_end") >= col("p_end")
  }

  private def modeOk(mode: OverlapMode, ps: Long, pe: Long, fs: Long, fe: Long): Boolean =
    mode match {
      case Overlap        => fs < pe && fe > ps
      case Contained      => fs >= ps && fe <= pe
      case ContainsRegion => fs <= ps && fe >= pe
    }

  /** Rename start/end with a side prefix; keep entity + payload. */
  private def prep(df: DataFrame, side: String): DataFrame = {
    val payload = df.columns.filterNot(Set("entity", "start", "end"))
    df.select(
      (Seq(col("entity"), col("start").as(s"${side}_start"), col("end").as(s"${side}_end")) ++
        payload.map(col)): _*)
  }

  /** Auto path: broadcast if the feature side is tiny, else binned. */
  def join(probes: DataFrame, feats: DataFrame, mode: OverlapMode = Overlap,
      binSize: Long = 8192L): DataFrame =
    binnedJoin(probes, feats, mode, binSize)

  /** Path 2 — binned/salted equi-join. Pure Catalyst; codegen end-to-end. */
  def binnedJoin(probes: DataFrame, feats: DataFrame, mode: OverlapMode,
      binSize: Long = 8192L): DataFrame = {
    require(binSize > 0)
    val p = prep(probes, "p").withColumn("__bin",
      explode(sequence(expr(s"p_start DIV ${binSize}L"), expr(s"(p_end - 1) DIV ${binSize}L"))))
    val f = prep(feats, "f").withColumn("__bin",
      explode(sequence(expr(s"f_start DIV ${binSize}L"), expr(s"(f_end - 1) DIV ${binSize}L"))))
    p.join(f, Seq("entity", "__bin"))
      .where(predicate(mode) &&
        expr(s"greatest(p_start, f_start) DIV ${binSize}L") === col("__bin"))
      .drop("__bin")
  }

  /** Path 1 — broadcast per-entity interval index + probe-side mapPartitions.
    * The feature side must fit in driver/executor memory (like the
    * reference's whole-index mmap, src/utils/tree_index.rs:21-34).
    */
  def broadcastJoin(probes: DataFrame, feats: DataFrame, mode: OverlapMode): DataFrame = {
    val spark = probes.sparkSession
    val p = prep(probes, "p")
    val f = prep(feats, "f")
    val fSchema = f.schema
    val fRows: Array[Row] = f.collect()
    val byEntity: Map[Any, IntervalIndex] =
      fRows.indices.groupBy(i => fRows(i).get(0)).map { case (e, idxs) =>
        e -> IntervalIndex.build(idxs.map(i => (fRows(i).getLong(1), fRows(i).getLong(2), i)).toArray)
      }
    val bc = spark.sparkContext.broadcast((fRows, byEntity))
    val outSchema = StructType(p.schema.fields ++ fSchema.fields.drop(1))
    p.mapPartitions { it =>
      val (rows, idx) = bc.value
      it.flatMap { pr =>
        idx.get(pr.get(0)) match {
          case None => Iterator.empty[Row]
          case Some(ix) =>
            val ps = pr.getLong(1); val pe = pr.getLong(2)
            val cands = mode match {
              case ContainsRegion => ix.queryPoint(ps)
              case _              => ix.queryRange(ps, pe)
            }
            cands.iterator
              .filter(i => modeOk(mode, ps, pe, rows(i).getLong(1), rows(i).getLong(2)))
              .map(i => Row.fromSeq(pr.toSeq ++ rows(i).toSeq.drop(1)))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Path 3 — union-tag plane sweep inside entity-hash partitions. */
  def sweepJoin(probes: DataFrame, feats: DataFrame, mode: OverlapMode): DataFrame = {
    val p = prep(probes, "p")
    val f = prep(feats, "f")
    val pPay = p.columns.drop(1) // p_start, p_end, payload...
    val fPay = f.columns.drop(1)
    val pStructT = StructType(p.schema.fields.drop(1))
    val fStructT = StructType(f.schema.fields.drop(1))
    val pu = p.select(col("entity"), col("p_start").as("__s"),
      struct(pPay.map(col): _*).as("__p"), lit(null).cast(fStructT).as("__f"))
    val fu = f.select(col("entity"), col("f_start").as("__s"),
      lit(null).cast(pStructT).as("__p"), struct(fPay.map(col): _*).as("__f"))
    val u = pu.unionByName(fu)
      .repartition(col("entity"))
      .sortWithinPartitions(col("entity"), col("__s"))
    val outSchema = StructType(p.schema.fields ++ f.schema.fields.drop(1))
    val m = mode
    u.mapPartitions { it =>
      var curEntity: Any = null
      // actives: (start, end, payloadRow), start-sorted by arrival
      val activeP = new ArrayBuffer[(Long, Long, Row)]()
      val activeF = new ArrayBuffer[(Long, Long, Row)]()
      it.flatMap { r =>
        val e = r.get(0)
        if (e != curEntity) { curEntity = e; activeP.clear(); activeF.clear() }
        val pr = if (r.isNullAt(2)) null else r.getStruct(2)
        val out = new ArrayBuffer[Row]()
        if (pr != null) {
          val ps = pr.getLong(0); val pe = pr.getLong(1)
          // scan feature actives: emit overlaps, compact expired
          var w = 0
          var i = 0
          while (i < activeF.length) {
            val (fs, fe, frow) = activeF(i)
            if (fe > ps) { // still live: fs <= ps (sorted), so live == overlapping
              if (modeOk(m, ps, pe, fs, fe)) out += Row.fromSeq(e +: (pr.toSeq ++ frow.toSeq))
              activeF(w) = activeF(i); w += 1
            }
            i += 1
          }
          activeF.dropRightInPlace(activeF.length - w)
          activeP += ((ps, pe, pr))
        } else {
          val frow = r.getStruct(3)
          val fs = frow.getLong(0); val fe = frow.getLong(1)
          var w = 0
          var i = 0
          while (i < activeP.length) {
            val (ps, pe, prow) = activeP(i)
            if (pe > fs) {
              if (modeOk(m, ps, pe, fs, fe)) out += Row.fromSeq(e +: (prow.toSeq ++ frow.toSeq))
              activeP(w) = activeP(i); w += 1
            }
            i += 1
          }
          activeP.dropRightInPlace(activeP.length - w)
          activeF += ((fs, fe, frow))
        }
        out
      }
    }(Encoders.row(outSchema))
  }

  /** Invert: probes with NO match under `mode` — the GLOBAL complement.
    * Deliberately different from the reference's candidate-level XOR invert
    * (src/commands/intersect.rs:137-164, implemented faithfully in
    * GffOps.intersect): this is the "rows not covered by any feature"
    * selection a pipeline uses to split a corpus.
    */
  def invert(probes: DataFrame, feats: DataFrame, mode: OverlapMode,
      probeKeys: Seq[String], binSize: Long = 8192L): DataFrame = {
    val matched = binnedJoin(probes, feats, mode, binSize)
      .select(probeKeys.map(col): _*).distinct()
    probes.join(matched, probeKeys, "left_anti")
  }
}
