package graft.queries

import graft.index.{GffOps, IndexBuild}
import graft.ops.{Contained, IntervalJoin, Overlap}
import graft.sources.GffSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle queries for the GFF index/query pipeline — the reference's core
  * lifecycle (index -> extract / search / intersect) end-to-end through
  * REAL text lines: a deterministic GFF fixture is rendered from `orders`
  * as tab-separated strings, parsed by GffSource.parseLines (field split,
  * coordinate normalize, skip types, attr regex — index_builder/core.rs:
  * 54-138), indexed by IndexBuild (dense fids, dictionaries, parent
  * closure, group extents), then queried by GffOps. The DuckDB twin
  * computes the expected output directly from the same arithmetic
  * (recursive CTE for the closure, window row_numbers for the dense ids).
  *
  * The fixture bakes in every normalize edge case: swapped coordinates
  * (k%11), end==0 dropped rows (k%13 mRNA — which also orphans its exon,
  * exercising the ghost-parent fallback-to-self, core.rs:162-168), and a
  * skip-type 'region' row (k%17).
  */
object GffQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Render the fixture as (line_no, value) raw GFF text lines.
    *
    * The key column is REPARTITIONED before the render: the sf parquet is a
    * single row-group, so without the shuffle the whole render + parse
    * chain (the widest string expressions in the engine) executes as ONE
    * task — measured 8.6 s single-task vs sub-second parallel at sf0.1.
    * Deterministic: every rendered value derives from `k` alone, and the
    * index build re-sorts by line_no, so partition layout never leaks into
    * results (the cross-parallelism fid-equality property test covers it).
    */
  def gffLines(s: SparkSession, d: String): DataFrame = {
    val o = Views.table(s, d, "orders")
      .where(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").cast("long").as("k"))
      // explicit partition count: with AQE a bare repartition(col) gets
      // coalesced back to ONE partition for this (tiny-bytes) fixture and
      // the whole chain serializes again
      .repartition(64, col("k"))
    o.select(col("k"), explode(expr("array(0L, 1L, 2L)")).as("lvl"))
      .withColumn("line_no", col("k") * 3 + col("lvl"))
      .withColumn("seqid", concat(lit("chr"), (col("k") % 5).cast("string")))
      .withColumn("ftype",
        when(col("lvl") === 2 && col("k") % 17 === 0, "region")
          .when(col("lvl") === 0, "gene")
          .when(col("lvl") === 1, "mRNA")
          .otherwise("exon"))
      .withColumn("gbase", (col("k") * 13) % 100000 + 1)
      .withColumn("glen", lit(50L) + col("k") % 100)
      .withColumn("raw_start",
        when(col("k") % 11 === 0, col("gbase") + col("glen")).otherwise(col("gbase")))
      .withColumn("raw_end",
        when(col("k") % 13 === 0 && col("lvl") === 1, lit(0L))
          .when(col("k") % 11 === 0, col("gbase"))
          .otherwise(col("gbase") + col("glen")))
      .withColumn("fid_name",
        concat(lit("f"), col("k").cast("string"), lit("_"), col("lvl").cast("string")))
      .withColumn("attrs", concat(
        lit("ID="), col("fid_name"),
        when(col("lvl") > 0,
          concat(lit(";Parent=f"), col("k").cast("string"), lit("_"),
            (col("lvl") - 1).cast("string"))).otherwise(lit("")),
        when(col("lvl") === 0,
          concat(lit(";gene_name=g"), (col("k") % 50).cast("string"))).otherwise(lit(""))))
      .select(col("line_no"),
        concat_ws("\t", col("seqid"), lit("src"), col("ftype"),
          col("raw_start").cast("string"), col("raw_end").cast("string"),
          lit("."), lit("+"), lit("."), col("attrs")).as("value"))
  }

  // index-once/query-many (the reference's whole model, README.md:383):
  // q32-q48 share ONE build + cached index tables per (session, dir).
  // Keyed by the SESSION OBJECT itself (reference identity — unlike
  // identityHashCode it cannot collide across GC'd-and-replaced sessions,
  // ADVICE r2) and BOUNDED: past MaxCachedIndexes the LRU entry is evicted
  // and its tables unpersisted, so no cached DataFrame outlives its
  // usefulness and at most 4 sessions are ever pinned.
  private val MaxCachedIndexes = 4
  private val indexCache =
    new java.util.LinkedHashMap[(SparkSession, String), (IndexBuild.IndexTables, Seq[DataFrame])](
      8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), (IndexBuild.IndexTables, Seq[DataFrame])]): Boolean = {
        val evict = size() > MaxCachedIndexes
        if (evict) e.getValue._2.foreach { df =>
          try df.unpersist(false) catch { case _: Throwable => () } // session may be stopped
        }
        evict
      }
    }

  private[graft] def index(s: SparkSession, d: String): IndexBuild.IndexTables =
    indexCache.synchronized {
      val key = (s, d)
      val hit = indexCache.get(key)
      if (hit != null) hit._1
      else {
        val t0 = IndexBuild.build(GffSource.parseLines(gffLines(s, d)))
        val t = t0.copy(features = t0.features.cache(), intervals = t0.intervals.cache(),
          entityDict = t0.entityDict.cache(), attrDict = t0.attrDict.cache(),
          groupExtents = t0.groupExtents.cache())
        val serving = Seq(t.features, t.intervals, t.entityDict, t.attrDict, t.groupExtents)
        // Eagerly materialize ONLY the features cache, then free the
        // build-time scratch (stage-1 feats + closure round caches; ADVICE
        // r2 cache-leak fix). Every other serving table is a plan OVER the
        // features table (IndexBuild re-derives the dictionaries from it),
        // so the lazy materializations read through this one cache — one
        // count job here, no silent re-parse anywhere.
        t.features.count()
        t0.releaseScratch()
        indexCache.put(key, (t, serving))
        t
      }
    }

  /** Shared DuckDB CTEs computing the expected post-index feature table
    * (`gfull`) from the same arithmetic. Callers prefix `WITH RECURSIVE `.
    */
  private val gffSql: String =
    """glines AS (
      |  SELECT o_orderkey AS k, lvl, o_orderkey * 3 + lvl AS line_no
      |  FROM orders, UNNEST([0, 1, 2]) AS t(lvl)
      |  WHERE o_orderkey % 2 = 0),
      |gfields AS (
      |  SELECT k, lvl, line_no,
      |    'chr' || CAST(k % 5 AS VARCHAR) AS seqid,
      |    CASE WHEN lvl = 2 AND k % 17 = 0 THEN 'region'
      |         WHEN lvl = 0 THEN 'gene' WHEN lvl = 1 THEN 'mRNA'
      |         ELSE 'exon' END AS ftype,
      |    (k * 13) % 100000 + 1 AS gbase,
      |    50 + (k % 100) AS glen,
      |    'f' || CAST(k AS VARCHAR) || '_' || CAST(lvl AS VARCHAR) AS id,
      |    CASE WHEN lvl = 0 THEN NULL
      |         ELSE 'f' || CAST(k AS VARCHAR) || '_' || CAST(lvl - 1 AS VARCHAR) END AS parent,
      |    CASE WHEN lvl = 0 THEN 'g' || CAST(k % 50 AS VARCHAR) ELSE NULL END AS attr
      |  FROM glines),
      |graw AS (
      |  SELECT *,
      |    CASE WHEN k % 11 = 0 THEN gbase + glen ELSE gbase END AS raw_start,
      |    CASE WHEN k % 13 = 0 AND lvl = 1 THEN 0
      |         WHEN k % 11 = 0 THEN gbase ELSE gbase + glen END AS raw_end
      |  FROM graw_base),
      |gkept AS (
      |  SELECT k, lvl, line_no, seqid, ftype, id, parent, attr,
      |    least(raw_start, raw_end) - 1 AS f_start,
      |    greatest(raw_start, raw_end) AS f_end
      |  FROM graw
      |  WHERE ftype NOT IN ('remark','note','comment','region','gap',
      |                      'assembly_gap','contig','scaffold','source')
      |    AND raw_end <> 0),
      |gfeat AS (
      |  SELECT *, row_number() OVER (ORDER BY line_no) - 1 AS fid FROM gkept),
      |gedges AS (
      |  SELECT c.fid AS id, COALESCE(p.fid, c.fid) AS parent
      |  FROM gfeat c LEFT JOIN gfeat p ON p.id = c.parent),
      |gr AS (
      |  SELECT id, parent AS root FROM gedges
      |  UNION ALL
      |  SELECT gr.id, e.parent FROM gr JOIN gedges e ON e.id = gr.root
      |  WHERE e.parent <> gr.root),
      |groots AS (
      |  SELECT gr.id AS fid, gr.root AS root_fid FROM gr
      |  WHERE NOT EXISTS (SELECT 1 FROM gedges e
      |                    WHERE e.id = gr.root AND e.parent <> gr.root)),
      |gent AS (
      |  SELECT seqid, row_number() OVER (ORDER BY min(line_no)) - 1 AS entity_id
      |  FROM gfeat GROUP BY seqid),
      |gattr AS (
      |  SELECT attr, row_number() OVER (ORDER BY min(fid)) - 1 AS aid
      |  FROM gfeat WHERE attr IS NOT NULL GROUP BY attr),
      |gfull AS (
      |  SELECT f.line_no, f.fid, e.entity_id, f.seqid, f.ftype,
      |    f.f_start AS "start", f.f_end AS "end",
      |    f.id, f.parent, f.attr, a.aid, r.root_fid
      |  FROM gfeat f JOIN groots r ON r.fid = f.fid
      |  JOIN gent e ON e.seqid = f.seqid
      |  LEFT JOIN gattr a ON a.attr = f.attr)"""
      .stripMargin
      // graw selects * from gfields then adds raw cols; a CTE cannot
      // reference itself, so alias the base
      .replace("FROM graw_base", "FROM gfields")

  // q32 — parse + full index build: the persisted features table
  // (S1, P1, P5-P8, P6 attr extraction, J4 closure, J8 root zip,
  //  dictionaries = index_builder/core.rs:41-242).
  val q32: Q = (s, d) => index(s, d).features

  val q32Sql: String =
    s"""WITH RECURSIVE $gffSql
       |SELECT line_no, fid, entity_id, seqid, ftype, "start", "end",
       |  id, parent, attr, aid, root_fid
       |FROM gfull""".stripMargin

  // q33 — extract: name list -> fids -> roots -> whole groups, file order
  // (S5, J3, J5 path shape, S8 sink; extract.rs:37-162).
  val q33: Q = (s, d) => {
    val t = index(s, d)
    val names = Views.table(s, d, "orders")
      .where(col("o_orderkey") % 30 === 0)
      .select(concat(lit("f"), col("o_orderkey").cast("long").cast("string"),
        lit("_1")).as("name"))
    GffOps.extract(t, names)
      .select("line_no", "fid", "id", "ftype", "start", "end", "root_fid")
  }

  val q33Sql: String =
    s"""WITH RECURSIVE $gffSql,
       |names AS (SELECT 'f' || CAST(o_orderkey AS VARCHAR) || '_1' AS name
       |  FROM orders WHERE o_orderkey % 30 = 0),
       |xr AS (SELECT DISTINCT g.root_fid FROM gfull g JOIN names n ON n.name = g.id)
       |SELECT g.line_no, g.fid, g.id, g.ftype, g."start", g."end", g.root_fid
       |FROM gfull g JOIN xr ON xr.root_fid = g.root_fid""".stripMargin

  // q34 — search --regex over the attr dictionary -> groups
  // (S6, M3, J5; search.rs:55-252).
  val q34: Q = (s, d) =>
    GffOps.searchRegex(index(s, d), Seq("^g1[0-9]$"))
      .select("line_no", "fid", "id", "ftype", "attr", "root_fid")

  val q34Sql: String =
    s"""WITH RECURSIVE $gffSql,
       |mr AS (SELECT DISTINCT root_fid FROM gfull
       |  WHERE attr IS NOT NULL AND regexp_matches(attr, '^g1[0-9]$$'))
       |SELECT g.line_no, g.fid, g.id, g.ftype, g.attr, g.root_fid
       |FROM gfull g JOIN mr ON mr.root_fid = g.root_fid""".stripMargin

  // q35 — intersect, Contained mode, match-only re-check + types filter
  // (J1 over the root-interval table, P2/P4, S10 sink;
  //  intersect.rs:232-438,500-517).
  val q35: Q = (s, d) => {
    val t = index(s, d)
    val regions = Views.table(s, d, "orders")
      .where(col("o_orderkey") % 40 === 0)
      .select(concat(lit("chr"), (col("o_orderkey") % 5).cast("string")).as("seqid"),
        ((col("o_orderkey") * 7) % 100000).cast("long").as("start"))
      .withColumn("end", col("start") + 900L)
      .join(t.entityDict, "seqid")
      .select("entity_id", "start", "end")
    GffOps.intersect(t, regions, Contained, matchOnly = true, types = Seq("exon", "gene"))
      .select("line_no", "fid", "id", "ftype", "start", "end")
  }

  val q35Sql: String =
    s"""WITH RECURSIVE $gffSql,
       |regions AS (
       |  SELECT e.entity_id, (o_orderkey * 7) % 100000 AS r_start,
       |    (o_orderkey * 7) % 100000 + 900 AS r_end
       |  FROM orders JOIN gent e ON e.seqid = 'chr' || CAST(o_orderkey % 5 AS VARCHAR)
       |  WHERE o_orderkey % 40 = 0),
       |givs AS (SELECT root_fid, min(entity_id) AS entity_id,
       |    min("start") AS g_start, max("end") AS g_end
       |  FROM gfull GROUP BY root_fid),
       |cand AS (SELECT DISTINCT i.root_fid FROM regions r JOIN givs i
       |  ON i.entity_id = r.entity_id AND i.g_start >= r.r_start AND i.g_end <= r.r_end)
       |SELECT g.line_no, g.fid, g.id, g.ftype, g."start", g."end"
       |FROM gfull g JOIN cand c ON c.root_fid = g.root_fid
       |WHERE g.ftype IN ('exon', 'gene')
       |  AND EXISTS (SELECT 1 FROM regions r WHERE r.entity_id = g.entity_id
       |              AND g."start" >= r.r_start AND g."end" <= r.r_end)""".stripMargin

  // q36 — bulk probe-interval table (the S3/depth.rs shape: the PROBE side
  // is the big table — lineitem-wide — driving the binned join).
  val q36: Q = (s, d) => {
    val probes = Views.probesBulk(s, d)
    val feats = Views.feats(s, d).select("entity", "start", "end", "fid")
    IntervalJoin.binnedJoin(probes, feats, Overlap, 256L)
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n_matches"), sum("fid").as("sum_fid"))
  }

  val q36Sql: String =
    s"""WITH ${Views.featsSql}, ${Views.probesBulkSql}
       |SELECT p.probe_id AS probe_id, count(*) AS n_matches,
       | CAST(sum(f.fid) AS BIGINT) AS sum_fid
       |FROM probes p JOIN feats f
       | ON p.entity = f.entity AND f.f_start < p.p_end AND f.f_end > p.p_start
       |GROUP BY p.probe_id""".stripMargin

  // q42 — S2 BED region scan through REAL text files: BED lines rendered
  // from orders (with comment lines, malformed coordinates, and extra BED
  // columns baked in), written to disk, re-read by GffSource.readBed
  // (whitespace split, cast->null->filter, start<end; intersect.rs:201-230).
  // BED fixture rendered ONCE per (JVM, sf-dir) into a stable scratch dir
  // (q42 scan + the q43/q44 end-to-end pipelines share it); comment lines,
  // malformed coordinates and extra BED columns baked in.
  //
  // Render-once synchronization (ADVICE r3): the render runs INSIDE the
  // monitor and the dir is marked rendered only AFTER the write succeeds —
  // the old add-then-write let a concurrent caller read a half-written dir,
  // and a failed write poisoned the mark for the rest of the JVM. Scratch
  // fixtures are tiny (the lock is held for a sub-second local write); the
  // same helper serves the q51 persisted-index scratch.
  private val renderedDirs = scala.collection.mutable.Set[String]()

  private def renderOnce(dir: String)(render: => Unit): String =
    renderedDirs.synchronized {
      if (!renderedDirs.contains(dir)) {
        render
        renderedDirs.add(dir)
      }
      dir
    }

  def bedFixtureDir(s: SparkSession, d: String): String =
    renderOnce(Views.scratchDir("bedfix", d)) {
      val dir = Views.scratchDir("bedfix", d)
      val lines = Views.table(s, d, "orders").where(col("o_orderkey") % 25 === 0)
        .select(
          when(col("o_orderkey") % 250 === 0, lit("# browser position chr1"))
            .when(col("o_orderkey") % 125 === 0,
              concat_ws("\t", concat(lit("chr"), (col("o_orderkey") % 5).cast("string")),
                lit("oops"), lit("10"))) // non-numeric start -> dropped
            .otherwise(concat_ws("\t",
              concat(lit("chr"), (col("o_orderkey") % 5).cast("string")),
              ((col("o_orderkey") * 11) % 100000).cast("string"),
              ((col("o_orderkey") * 11) % 100000 + 1 + col("o_custkey") % 50).cast("string"),
              lit("feat"), lit("0"), lit("+"))) // extra BED columns ignored
            .as("value"))
      lines.write.mode("overwrite").text(dir)
    }

  val q42: Q = (s, d) => GffSource.readBed(s, bedFixtureDir(s, d))

  val q42Sql: String =
    """SELECT 'chr' || CAST(o_orderkey % 5 AS VARCHAR) AS seqid,
      | (o_orderkey*11) % 100000 AS "start",
      | (o_orderkey*11) % 100000 + 1 + (o_custkey % 50) AS "end"
      |FROM orders WHERE o_orderkey % 25 = 0 AND o_orderkey % 125 <> 0""".stripMargin

  /** Shared DuckDB CTE bodies for the BED-driven pipelines: the valid BED
    * rows (q42's arithmetic) and the per-root interval table.
    */
  private val bedSql: String =
    """bed AS (SELECT 'chr' || CAST(o_orderkey % 5 AS VARCHAR) AS seqid,
      |  (o_orderkey*11) % 100000 AS b_start,
      |  (o_orderkey*11) % 100000 + 1 + (o_custkey % 50) AS b_end
      |  FROM orders WHERE o_orderkey % 25 = 0 AND o_orderkey % 125 <> 0)""".stripMargin

  private val givsSql: String =
    """givs AS (SELECT root_fid, min(entity_id) AS entity_id,
      |  min("start") AS g_start, max("end") AS g_end
      |  FROM gfull GROUP BY root_fid)""".stripMargin

  // q43 — END-TO-END coverage pipeline (coverage.rs:493-582 + merge
  // semantics coverage.rs:431-443): REAL rendered BED files -> readBed ->
  // entity dictionary -> interval join against the index's per-root
  // intervals -> clip -> per-root island-merged breadth + fraction. Every
  // stage was individually oracle-green in r2 (q42, q36, q09); this wires
  // the whole command the way a reference user runs `gffx coverage`.
  val q43: Q = (s, d) => {
    val t = index(s, d)
    val bed = GffSource.readBed(s, bedFixtureDir(s, d))
    val probes = bed.join(t.entityDict, "seqid")
      .select(col("entity_id").as("entity"), col("start"), col("end"))
    val ivs = t.intervals.select(col("entity_id").as("entity"), col("start"),
      col("end"), col("root_fid"))
    val pairs = IntervalJoin.join(probes, ivs, Overlap)
    val cov = graft.ops.Coverage.breadth(pairs, "root_fid", Nil)
    t.groupExtents.select(col("root_fid"), col("entity_id"), col("g_start"), col("g_end"))
      .join(cov, Seq("root_fid"), "left")
      .select(col("root_fid"), col("entity_id"), col("g_start"), col("g_end"),
        coalesce(col("breadth"), lit(0L)).as("breadth"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        (coalesce(col("breadth"), lit(0L)).cast("double") /
          (col("g_end") - col("g_start")).cast("double")).as("fraction"))
  }

  val q43Sql: String =
    s"""WITH RECURSIVE $gffSql,
       |$bedSql,
       |$givsSql,
       |pairs AS (SELECT i.root_fid,
       |  greatest(b.b_start, i.g_start) AS cs, least(b.b_end, i.g_end) AS ce
       |  FROM bed b JOIN gent e ON e.seqid = b.seqid
       |  JOIN givs i ON i.entity_id = e.entity_id
       |    AND i.g_start < b.b_end AND i.g_end > b.b_start),
       |m AS (SELECT root_fid, cs, ce,
       |  max(ce) OVER (PARTITION BY root_fid ORDER BY cs, ce
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe FROM pairs),
       |i2 AS (SELECT root_fid, cs, ce,
       |  SUM(CASE WHEN maxe IS NULL OR cs > maxe THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY root_fid ORDER BY cs, ce
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl FROM m),
       |g2 AS (SELECT root_fid, isl, min(cs) AS s, max(ce) AS e FROM i2 GROUP BY 1, 2),
       |cov AS (SELECT root_fid, CAST(sum(e - s) AS BIGINT) AS breadth,
       |  count(*) AS n_islands FROM g2 GROUP BY root_fid)
       |SELECT v.root_fid, v.entity_id, v.g_start, v.g_end,
       | COALESCE(c.breadth, 0) AS breadth, COALESCE(c.n_islands, 0) AS n_islands,
       | CAST(COALESCE(c.breadth, 0) AS DOUBLE) /
       |   CAST(v.g_end - v.g_start AS DOUBLE) AS fraction
       |FROM givs v LEFT JOIN cov c ON c.root_fid = v.root_fid""".stripMargin

  // q44 — END-TO-END depth pipeline (depth.rs:548-635): same BED front +
  // interval join, per-root overlapping-read count (every BED line is a
  // read; 0 for uncovered roots).
  val q44: Q = (s, d) => {
    val t = index(s, d)
    val bed = GffSource.readBed(s, bedFixtureDir(s, d))
    val probes = bed.join(t.entityDict, "seqid")
      .select(col("entity_id").as("entity"), col("start"), col("end"))
    val ivs = t.intervals.select(col("entity_id").as("entity"), col("start"),
      col("end"), col("root_fid"))
    val dep = IntervalJoin.join(probes, ivs, Overlap)
      .groupBy(col("root_fid")).agg(count(lit(1)).as("depth"))
    t.groupExtents.select(col("root_fid"), col("entity_id"), col("g_start"), col("g_end"))
      .join(dep, Seq("root_fid"), "left")
      .select(col("root_fid"), col("entity_id"), col("g_start"), col("g_end"),
        coalesce(col("depth"), lit(0L)).as("depth"))
  }

  val q44Sql: String =
    s"""WITH RECURSIVE $gffSql,
       |$bedSql,
       |$givsSql,
       |h AS (SELECT i.root_fid, count(*) AS depth
       |  FROM bed b JOIN gent e ON e.seqid = b.seqid
       |  JOIN givs i ON i.entity_id = e.entity_id
       |    AND i.g_start < b.b_end AND i.g_end > b.b_start
       |  GROUP BY i.root_fid)
       |SELECT v.root_fid, v.entity_id, v.g_start, v.g_end,
       | COALESCE(h.depth, 0) AS depth
       |FROM givs v LEFT JOIN h ON h.root_fid = v.root_fid""".stripMargin

  // q45 — S4 region literal: `chr:start-end` parsed by parseRegion
  // (intersect.rs:172-198), resolved through the entity dictionary, then
  // the standard intersect path (entire-group output).
  val q45: Q = (s, d) => {
    val t = index(s, d)
    val (chr, rs, re) = GffSource.parseRegion("chr2:5000-60000")
    val region = s.range(1)
      .select(lit(chr).as("seqid"), lit(rs).as("start"), lit(re).as("end"))
      .join(t.entityDict, "seqid")
      .select(col("entity_id"), col("start"), col("end"))
    GffOps.intersect(t, region, Overlap)
      .select("line_no", "fid", "id", "ftype", "start", "end")
  }

  val q45Sql: String =
    s"""WITH RECURSIVE $gffSql,
       |$givsSql,
       |regions AS (SELECT e.entity_id, 5000 AS r_start, 60000 AS r_end
       |  FROM gent e WHERE e.seqid = 'chr2'),
       |cand AS (SELECT DISTINCT i.root_fid FROM regions r JOIN givs i
       |  ON i.entity_id = r.entity_id AND i.g_start < r.r_end AND i.g_end > r.r_start)
       |SELECT g.line_no, g.fid, g.id, g.ftype, g."start", g."end"
       |FROM gfull g JOIN cand c ON c.root_fid = g.root_fid""".stripMargin

  // q46 — S11 TSV sink ROUND-TRIP (coverage.rs:453-490): q43's coverage
  // table written through writeTsv (single tab-separated file with header),
  // re-read as text-typed csv, cast back. The oracle is q43's — proof the
  // sink emits exactly the rows it was given.
  val q46: Q = (s, d) => {
    val dir = Views.scratchDir("tsv_q46", d)
    GffSource.writeTsv(q43(s, d), dir)
    s.read.option("sep", "\t").option("header", "true").csv(dir)
      .select(col("root_fid").cast("long"), col("entity_id").cast("long"),
        col("g_start").cast("long"), col("g_end").cast("long"),
        col("breadth").cast("long"), col("n_islands").cast("long"),
        col("fraction").cast("double"))
  }

  val q46Sql: String = q43Sql

  // q47 — A1 per-root probe bucketing (intersect.rs:598-607,
  // coverage.rs:180-190): root_fid -> match count + SORTED probe-id list
  // (projected to csv text: the driver's canonicalizer cannot hash array
  // columns — same workaround as q19's tokens_md5).
  val q47: Q = (s, d) => {
    val t = index(s, d)
    val regions = Views.table(s, d, "orders")
      .where(col("o_orderkey") % 40 === 0)
      .select(col("o_orderkey").cast("long").as("probe_id"),
        concat(lit("chr"), (col("o_orderkey") % 5).cast("string")).as("seqid"),
        ((col("o_orderkey") * 7) % 100000).cast("long").as("start"))
      .withColumn("end", col("start") + 900L)
      .join(t.entityDict, "seqid")
      .select(col("probe_id"), col("entity_id"), col("start"), col("end"))
    GffOps.matchesPerRoot(t, regions, Overlap)
      .select(col("root_fid"), col("n_matches"),
        expr("array_join(transform(probe_ids, x -> CAST(x AS STRING)), ',')")
          .as("probe_ids_csv"))
  }

  val q47Sql: String =
    s"""WITH RECURSIVE $gffSql,
       |$givsSql,
       |regions AS (SELECT CAST(o_orderkey AS BIGINT) AS probe_id, e.entity_id,
       |  (o_orderkey*7) % 100000 AS r_start, (o_orderkey*7) % 100000 + 900 AS r_end
       |  FROM orders JOIN gent e ON e.seqid = 'chr' || CAST(o_orderkey % 5 AS VARCHAR)
       |  WHERE o_orderkey % 40 = 0),
       |h AS (SELECT i.root_fid, r.probe_id FROM regions r JOIN givs i
       |  ON i.entity_id = r.entity_id AND i.g_start < r.r_end AND i.g_end > r.r_start)
       |SELECT root_fid, count(*) AS n_matches,
       | array_to_string(list(CAST(probe_id AS VARCHAR) ORDER BY probe_id), ',')
       |   AS probe_ids_csv
       |FROM h GROUP BY root_fid""".stripMargin

  // q48 — missing-name reporting (extract.rs:88-111: warn + skip): names
  // absent from the index, including REAL dropouts — `f<k>_1` mRNA rows
  // dropped at parse time by the end==0 rule (k % 13 == 0) — not just the
  // injected bogus names.
  val q48: Q = (s, d) => {
    val t = index(s, d)
    val names = Views.table(s, d, "orders")
      .where(col("o_orderkey") % 30 === 0)
      .select(when(col("o_orderkey") % 60 === 0,
          concat(lit("nope_"), col("o_orderkey").cast("long").cast("string")))
        .otherwise(concat(lit("f"), col("o_orderkey").cast("long").cast("string"),
          lit("_1")))
        .as("name"))
    GffOps.missingNames(t, names)
  }

  val q48Sql: String =
    s"""WITH RECURSIVE $gffSql,
       |names AS (SELECT DISTINCT
       |  CASE WHEN o_orderkey % 60 = 0 THEN 'nope_' || CAST(o_orderkey AS VARCHAR)
       |       ELSE 'f' || CAST(o_orderkey AS VARCHAR) || '_1' END AS id
       |  FROM orders WHERE o_orderkey % 30 = 0)
       |SELECT n.id FROM names n
       |WHERE NOT EXISTS (SELECT 1 FROM gfull g WHERE g.id = n.id)""".stripMargin

  // q49 — BYTE-FAITHFUL raw block output (common.rs:188-287: the
  // reference re-emits the ORIGINAL line bytes of matched groups, not a
  // re-serialization): extract's matched line_nos joined back to the raw
  // rendered text lines, file-ordered. The oracle re-renders the exact
  // line text (tab joins, coordinate strings, attribute string) from the
  // same arithmetic — any byte difference fails the hash compare.
  val q49: Q = (s, d) => {
    val t = index(s, d)
    val names = Views.table(s, d, "orders")
      .where(col("o_orderkey") % 30 === 0)
      .select(concat(lit("f"), col("o_orderkey").cast("long").cast("string"),
        lit("_1")).as("name"))
    val matched = GffOps.extract(t, names).select("line_no")
    gffLines(s, d).join(matched, "line_no").orderBy("line_no")
      .select("line_no", "value")
  }

  val q49Sql: String =
    s"""WITH RECURSIVE $gffSql,
       |rawlines AS (SELECT line_no,
       |  seqid || chr(9) || 'src' || chr(9) || ftype || chr(9) ||
       |  CAST(raw_start AS VARCHAR) || chr(9) || CAST(raw_end AS VARCHAR) || chr(9) ||
       |  '.' || chr(9) || '+' || chr(9) || '.' || chr(9) ||
       |  'ID=' || id ||
       |  CASE WHEN lvl > 0 THEN ';Parent=' || parent ELSE '' END ||
       |  CASE WHEN lvl = 0 THEN ';gene_name=' || attr ELSE '' END AS value
       |  FROM graw),
       |names AS (SELECT 'f' || CAST(o_orderkey AS VARCHAR) || '_1' AS name
       |  FROM orders WHERE o_orderkey % 30 = 0),
       |xr AS (SELECT DISTINCT g.root_fid FROM gfull g JOIN names n ON n.name = g.id),
       |ml AS (SELECT DISTINCT g.line_no FROM gfull g JOIN xr ON xr.root_fid = g.root_fid)
       |SELECT r.line_no, r.value FROM rawlines r JOIN ml ON ml.line_no = r.line_no""".stripMargin

  // q51 — PERSISTED-index round-trip (index-once/query-many across JOBS,
  // not just sessions): the in-memory index tables written as partitioned
  // parquet + manifest (IndexBuild.write ≙ the reference's 8 sidecar
  // files, common.rs:151-170 + tree_io.rs:37-63), re-opened cold by
  // IndexBuild.load, and q33's extract re-run over the LOADED tables
  // against q33's unchanged oracle — proof the parquet index serves
  // byte-identically to the freshly-built one (README.md:383-395: a
  // reference user indexes once, then extracts from the sidecars forever).
  val q51: Q = (s, d) => {
    val dir = renderOnce(Views.scratchDir("gffidx_q51", d)) {
      IndexBuild.write(index(s, d), Views.scratchDir("gffidx_q51", d))
    }
    val t = IndexBuild.load(s, dir)
    val names = Views.table(s, d, "orders")
      .where(col("o_orderkey") % 30 === 0)
      .select(concat(lit("f"), col("o_orderkey").cast("long").cast("string"),
        lit("_1")).as("name"))
    GffOps.extract(t, names)
      .select("line_no", "fid", "id", "ftype", "start", "end", "root_fid")
  }

  val q51Sql: String = q33Sql

  // q53 — the SQL FRONT-END end-to-end: q36's bulk interval join written
  // as the PLAIN theta-join SQL a user would type, executed through
  // spark.sql in a session whose extensions load plans/IntervalBinRule.
  // With the broadcast guard forced open (both sides "big", the 100-TB
  // posture), the optimizer rewrites the theta join onto the binned
  // (entity, bin) equi-join — the engine path — and the result must
  // match the same SQL's DuckDB answer (q36's oracle). This closes the
  // fidelity gap between SparkEntry.queries and ad-hoc user SQL
  // (reference analog: the index-vs-scan choice at query open,
  // intersect.rs:104-133).
  val q53: Q = (s, d) => {
    Views.probesBulk(s, d).createOrReplaceTempView("graft_q53_probes")
    Views.feats(s, d).select(col("entity"), col("start"), col("end"), col("fid"))
      .createOrReplaceTempView("graft_q53_feats")
    // Persistent session flag, NOT a temporarily-lowered broadcast
    // threshold: Verify/Bench wrap this df (`coalesce(1).write`,
    // checksum agg), which re-optimizes the plan at action time — a
    // restored threshold would silently drop the rewrite from the plan
    // that actually EXECUTES. The flag only affects this theta pattern,
    // which no other query types in SQL. The bin width matches the 256
    // the operator-API twin (q36) passes for this corpus (~2x the max
    // interval length; r6: the rule's 8192 default left ~3k rows per
    // (entity, bin) key per side — quadratic per-key pair work, 2-3x wall clock.
    s.conf.set("spark.graft.intervalBin.force", "1")
    s.conf.set("spark.graft.intervalBin.size", "256")
    val df = s.sql(
      """SELECT p.probe_id AS probe_id, count(*) AS n_matches,
        |  sum(f.fid) AS sum_fid
        |FROM graft_q53_probes p JOIN graft_q53_feats f
        |  ON p.entity = f.entity AND p.start < f.end AND p.end > f.start
        |GROUP BY p.probe_id""".stripMargin)
    if (!df.queryExecution.executedPlan.toString.contains("__graft_bin"))
      System.err.println("[q53] WARNING: IntervalBinRule did not engage " +
        "(session extensions not loaded?) — result still correct, path is not the engine's")
    df
  }

  val q53Sql: String = q36Sql

  // q55 — the SQL front-end's CONTAINMENT pattern (the round-4 gap: only
  // the strict-overlap theta shape re-planned; Contained/ContainsRegion
  // SQL still got SortMergeJoin-on-entity + filter, per-entity quadratic).
  // Same tables as q53, but the user types Contained-mode SQL (probe
  // within feature, >=/<= conjuncts). IntervalBinRule.rewriteContainment
  // re-plans it onto a single binned (entity, bin) shuffle-merge
  // equi-join whose emit-once bin covers degenerate intervals too;
  // asserted to fire.
  val q55: Q = (s, d) => {
    Views.probesBulk(s, d).createOrReplaceTempView("graft_q55_probes")
    Views.feats(s, d).select(col("entity"), col("start"), col("end"), col("fid"))
      .createOrReplaceTempView("graft_q55_feats")
    s.conf.set("spark.graft.intervalBin.force", "1")
    s.conf.set("spark.graft.intervalBin.size", "256") // see q53's width note
    val df = s.sql(
      """SELECT p.probe_id AS probe_id, count(*) AS n_matches,
        |  sum(f.fid) AS sum_fid
        |FROM graft_q55_probes p JOIN graft_q55_feats f
        |  ON p.entity = f.entity AND p.start >= f.start AND p.end <= f.end
        |GROUP BY p.probe_id""".stripMargin)
    if (!df.queryExecution.executedPlan.toString.contains("__graft_bin"))
      System.err.println("[q55] WARNING: containment rewrite did not engage " +
        "(session extensions not loaded?) — result still correct, path is not the engine's")
    df
  }

  val q55Sql: String =
    s"""WITH ${Views.featsSql}, ${Views.probesBulkSql}
       |SELECT p.probe_id AS probe_id, count(*) AS n_matches,
       | CAST(sum(f.fid) AS BIGINT) AS sum_fid
       |FROM probes p JOIN feats f
       | ON p.entity = f.entity AND p.p_start >= f.f_start AND p.p_end <= f.f_end
       |GROUP BY p.probe_id""".stripMargin

  val defs: Map[String, Q] = Map(
    "q55_sql_containment" -> q55,
    "q53_sql_frontend" -> q53,
    "q51_index_roundtrip" -> q51,
    "q49_raw_block_sink" -> q49,
    "q42_bed_scan" -> q42,
    "q32_gff_index" -> q32,
    "q33_gff_extract" -> q33,
    "q34_gff_search_regex" -> q34,
    "q35_gff_intersect_matchonly" -> q35,
    "q36_bulk_probe_overlap" -> q36,
    "q43_coverage_pipeline" -> q43,
    "q44_depth_pipeline" -> q44,
    "q45_region_literal" -> q45,
    "q46_tsv_roundtrip" -> q46,
    "q47_matches_per_root" -> q47,
    "q48_missing_names" -> q48)

  val oracles: Map[String, String] = Map(
    "q55_sql_containment" -> q55Sql,
    "q53_sql_frontend" -> q53Sql,
    "q51_index_roundtrip" -> q51Sql,
    "q49_raw_block_sink" -> q49Sql,
    "q42_bed_scan" -> q42Sql,
    "q32_gff_index" -> q32Sql,
    "q33_gff_extract" -> q33Sql,
    "q34_gff_search_regex" -> q34Sql,
    "q35_gff_intersect_matchonly" -> q35Sql,
    "q36_bulk_probe_overlap" -> q36Sql,
    "q43_coverage_pipeline" -> q43Sql,
    "q44_depth_pipeline" -> q44Sql,
    "q45_region_literal" -> q45Sql,
    "q46_tsv_roundtrip" -> q46Sql,
    "q47_matches_per_root" -> q47Sql,
    "q48_missing_names" -> q48Sql)
}
