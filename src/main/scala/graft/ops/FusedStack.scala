package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** One-pass fused per-entity feature stack (SURVEY §2.8 escalation path
  * (d), justified by measurement): the SAME features as
  * [[WindowFeatures.stack]] — lag/lead, backfill (LOCF), rolling
  * sum/cnt/min/max, session id — computed in a single mapPartitions over
  * (entity, time, tiebreak)-sorted partitions.
  *
  * Why it exists: Catalyst plans the declarative stack as 2 WindowExec
  * operators (the session id depends on lag(time), so it can never
  * collapse into the first Window), and EACH WindowExec copies every row
  * into an UnsafeRow buffer — the measured single-box scaling ceiling of
  * the window pipeline (BASELINE.md: all workers pinned in
  * Platform.copyMemory). This operator keeps only an O(max(lead, rollN))
  * ring per entity and streams rows through one exchange + one sort,
  * zero re-buffering.
  *
  * Trade-off: it is opaque to Catalyst (no column pruning through it), so
  * it is the physical-path OPTION for wide feature stacks, not the default
  * — exactly like the reference chooses its in-memory tree only when the
  * index fits (tree_index.rs:21-34). Values are verified equal to the
  * declarative stack by FusedStackSpec and oracle query q38.
  */
object FusedStack {

  /** df must carry: entity (any type), `time` long, `tiebreak` long,
    * `lagCol` double (nullable), `backfillCol` double (nullable),
    * `rollCol` long (nullable). Output appends, in order:
    * {lagCol}_lag{k}/{lagCol}_lead{k} per offset, {backfillCol}_ff,
    * {rollCol}_rsum/rcnt/rmin/rmax{n}, session_id — same names and values
    * as WindowFeatures.stack.
    */
  def stack(df: DataFrame, lagCol: String, lagOffsets: Seq[Int], backfillCol: String,
      rollCol: String, rollN: Int, gap: Long,
      entity: String = "entity", time: String = "event_time",
      tiebreak: String = ""): DataFrame = {
    require(lagOffsets.nonEmpty && rollN >= 1)
    val sortCols = Seq(col(entity), col(time)) ++
      (if (tiebreak.isEmpty) Nil else Seq(col(tiebreak)))
    val sorted = df.repartition(col(entity)).sortWithinPartitions(sortCols: _*)

    val inSchema = df.schema
    val eIdx = inSchema.fieldIndex(entity)
    val tIdx = inSchema.fieldIndex(time)
    val lagIdx = inSchema.fieldIndex(lagCol)
    val bfIdx = inSchema.fieldIndex(backfillCol)
    val rollIdx = inSchema.fieldIndex(rollCol)
    val maxLead = lagOffsets.max
    val maxLag = lagOffsets.max

    val outFields = inSchema.fields ++
      lagOffsets.flatMap(k => Seq(
        StructField(s"${lagCol}_lag$k", DoubleType, nullable = true),
        StructField(s"${lagCol}_lead$k", DoubleType, nullable = true))) ++
      Seq(StructField(s"${backfillCol}_ff", DoubleType, nullable = true),
        StructField(s"${rollCol}_rsum$rollN", LongType, nullable = true),
        StructField(s"${rollCol}_rcnt$rollN", LongType, nullable = false),
        StructField(s"${rollCol}_rmin$rollN", LongType, nullable = true),
        StructField(s"${rollCol}_rmax$rollN", LongType, nullable = true),
        StructField("session_id", LongType, nullable = false))
    val outSchema = StructType(outFields)
    val offsets = lagOffsets.toArray

    sorted.mapPartitions { it =>
      new Iterator[Row] {
        // pending rows awaiting their lead horizon; emitted maxLead behind
        private val pending = mutable.Queue.empty[Row]
        // last maxLag values of lagCol (most recent last), per entity
        private val lagRing = mutable.ArrayDeque.empty[java.lang.Double]
        // last rollN values of rollCol for the PENDING HEAD's position are
        // not derivable once rows queue up, so each pending row stores its
        // already-computed causal features; only lead needs the future.
        private var curEntity: Any = null
        private val rollRing = mutable.ArrayDeque.empty[java.lang.Long]
        private var ff: java.lang.Double = null
        private var prevT: java.lang.Long = null
        private var session: Long = -1L
        // per pending row: causal features frozen at arrival
        private val pendingFeat = mutable.Queue.empty[Array[Any]]
        private val out = mutable.Queue.empty[Row]

        private def flushEntity(): Unit = {
          // entity ended: emit the queue's tail with nulls for missing leads
          while (pending.nonEmpty) emitHead()
        }

        private def emitHead(): Unit = {
          val r = pending.dequeue()
          val feat = pendingFeat.dequeue()
          // leads: k-th element after this row within the SAME entity =
          // pending position k-1 (rows still queued are all same-entity)
          val leads = offsets.map { k =>
            if (pending.length >= k) pending(k - 1).get(lagIdx) else null
          }
          val vals = new Array[Any](outFields.length)
          var i = 0
          while (i < inSchema.length) { vals(i) = r.get(i); i += 1 }
          var fi = inSchema.length
          var oi = 0
          while (oi < offsets.length) {
            vals(fi) = feat(oi); fi += 1          // lag_k
            vals(fi) = leads(oi); fi += 1         // lead_k
            oi += 1
          }
          var rest = offsets.length
          while (rest < feat.length) { vals(fi) = feat(rest); fi += 1; rest += 1 }
          out.enqueue(new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(vals, outSchema))
        }

        private def ingest(r: Row): Unit = {
          val e = r.get(eIdx)
          if (e != curEntity) {
            flushEntity()
            curEntity = e
            lagRing.clear(); rollRing.clear()
            ff = null; prevT = null; session = -1L
          }
          val t = r.getLong(tIdx)
          // session id (break on gap from previous event)
          if (prevT == null || t - prevT > gap) session += 1L
          prevT = t
          // lags from the ring (most recent last)
          val lags = offsets.map { k =>
            if (lagRing.length >= k) lagRing(lagRing.length - k) else null
          }
          // LOCF
          if (!r.isNullAt(bfIdx)) ff = r.getDouble(bfIdx)
          // rolling over last rollN INCLUDING current
          val rv: java.lang.Long = if (r.isNullAt(rollIdx)) null else r.getLong(rollIdx)
          rollRing.append(rv)
          if (rollRing.length > rollN) rollRing.removeHead()
          var rsum = 0L; var rcnt = 0L
          var rmin = Long.MaxValue; var rmax = Long.MinValue
          rollRing.foreach { v =>
            if (v != null) { rsum += v; rcnt += 1; if (v < rmin) rmin = v; if (v > rmax) rmax = v }
          }
          val rsumO: Any = if (rcnt == 0) null else rsum
          val rminO: Any = if (rcnt == 0) null else rmin
          val rmaxO: Any = if (rcnt == 0) null else rmax
          // lag ring update AFTER reading lags
          lagRing.append(if (r.isNullAt(lagIdx)) null else Double.box(r.getDouble(lagIdx)))
          if (lagRing.length > maxLag) lagRing.removeHead()

          pending.enqueue(r)
          pendingFeat.enqueue(
            (lags ++ Seq[Any](ff, rsumO, rcnt, rminO, rmaxO, session)).toArray)
          // emit rows whose lead horizon is satisfied
          while (pending.length > maxLead) emitHead()
        }

        override def hasNext: Boolean = {
          while (out.isEmpty && it.hasNext) ingest(it.next())
          if (out.isEmpty && !it.hasNext) flushEntity()
          out.nonEmpty
        }
        override def next(): Row = out.dequeue()
      }
    }(Encoders.row(outSchema))
  }
}
