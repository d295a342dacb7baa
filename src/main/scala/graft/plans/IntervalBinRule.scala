package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL front-end for the interval-join family: an optimizer rule that
  * rewrites the interval-overlap THETA join pattern
  *
  *   a JOIN b ON a.entity = b.entity
  *             AND a.start < b.end AND a.end > b.start
  *
  * into the engine's binned equi-join (ops.IntervalJoin.binnedJoin's plan
  * shape, built directly in the logical algebra): both sides explode into
  * fixed-width coordinate bins, the join becomes an equi-join on
  * (entity, bin), and a pair is emitted ONLY in its intersection-start
  * bin — exactly-once, no dedup. Registered via [[graft.functions.GraftExtensions]],
  * so AD-HOC SQL (including the DuckDB oracle queries themselves) takes
  * the engine's physical path instead of Spark's default for this
  * pattern: a SortMergeJoin on `entity` alone with the range predicates
  * as a post-join filter — per-entity |a|x|b| pair work, the q35/q36
  * quadratic this engine exists to avoid (reference analog: the
  * index-vs-scan choice at query open, intersect.rs:104-133).
  *
  * Guarded: fires only when BOTH sides' plan stats exceed the session's
  * autoBroadcastJoinThreshold — a broadcastable side is better served by
  * Spark's own BroadcastNestedLoopJoin, and at 100 TB both sides blow the
  * threshold and the rewrite engages. Extra join conjuncts beyond the
  * recognized pattern are preserved untouched.
  */
object IntervalBinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinSize = 8192L

  private def toLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Which side of the join an expression's references live on entirely:
    * Some(true)=left, Some(false)=right, None=mixed/neither.
    */
  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  private def isCoord(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** Normalized strict inequality: (leftSideExpr, rightSideExpr, leftIsLess). */
  private def normalize(c: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Boolean)] = c match {
    case LessThan(a, b) => (sideOf(a, l, r), sideOf(b, l, r)) match {
      case (Some(true), Some(false)) if isCoord(a) && isCoord(b) => Some((a, b, true))
      case (Some(false), Some(true)) if isCoord(a) && isCoord(b) => Some((b, a, false))
      case _ => None
    }
    case GreaterThan(a, b) => (sideOf(a, l, r), sideOf(b, l, r)) match {
      case (Some(true), Some(false)) if isCoord(a) && isCoord(b) => Some((a, b, false))
      case (Some(false), Some(true)) if isCoord(a) && isCoord(b) => Some((b, a, true))
      case _ => None
    }
    case _ => None
  }

  /** Normalized NON-STRICT inequality `big >= small` with each expression
    * entirely on one side: (bigExpr, smallExpr, bigIsLeft). Feeds the
    * containment pattern (Contained / ContainsRegion-shaped SQL).
    */
  private def normalizeGe(c: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Boolean)] = c match {
    case GreaterThanOrEqual(a, b) => (sideOf(a, l, r), sideOf(b, l, r)) match {
      case (Some(x), Some(y)) if x != y && isCoord(a) && isCoord(b) => Some((a, b, x))
      case _ => None
    }
    case LessThanOrEqual(a, b) => (sideOf(a, l, r), sideOf(b, l, r)) match {
      case (Some(x), Some(y)) if x != y && isCoord(a) && isCoord(b) => Some((b, a, y))
      case _ => None
    }
    case _ => None
  }

  /** child + Generate(explode(sequence(s div B, (e-1) div B))) -> bin attr. */
  private def withBins(child: LogicalPlan, s: Expression, e: Expression)
      : (LogicalPlan, Attribute) = {
    val b = Literal(BinSize, LongType)
    // Sequence is TimeZoneAwareExpression: without an explicit zone the
    // node stays unresolved and the optimizer rejects the rewritten plan
    val seq = new Sequence(
      IntegralDivide(toLong(s), b),
      IntegralDivide(Subtract(toLong(e), Literal(1L, LongType)), b))
      .withTimeZone(conf.sessionLocalTimeZone)
    val binAttr = AttributeReference("__graft_bin", LongType, nullable = true)()
    (Generate(Explode(seq), Nil, outer = false, None, Seq(binAttr), child), binAttr)
  }

  /** Session override `spark.graft.intervalBin.force=1` bypasses the
    * broadcastability guard — the only reliable way to exercise the
    * engine path at fixture scale from a QUERY (q53): the guard reads
    * plan stats lazily at each optimization, and wrappers like
    * `.coalesce(1).write` or a checksum agg re-optimize the plan later,
    * when any temporary autoBroadcastJoinThreshold juggling has been
    * restored. At 100 TB the stats guard engages by itself.
    */
  private def forced: Boolean =
    conf.getConfString("spark.graft.intervalBin.force", "0") == "1"

  /** The rewritten join is FORCED to a shuffle-merge join — the same
    * contract as ops.IntervalJoin.binnedJoin's hint("shuffle_merge"), for
    * the same reason, re-measured on this rule's own output: the binned
    * equi-join has FEW distinct keys (entities x coordinate-bins) with
    * thousands of rows per key, and a broadcast-hash plan walks the hashed
    * relation's duplicate chain per streamed row — random access per
    * candidate pair (measured 539 s on the q53 join at sf0.1, where the
    * sort-merge plan's sequential buffered-run iteration takes 16 s, 33x).
    * At the design scale both sides blow the broadcast threshold anyway;
    * the hint only closes the mid-scale window where the planner would
    * still pick broadcast. A user-supplied strategy hint wins.
    */
  private def shuffleMerge(h: JoinHint): JoinHint = {
    def f(o: Option[HintInfo]): Option[HintInfo] = o match {
      case Some(hi) if hi.strategy.isDefined => o
      case Some(hi) => Some(hi.copy(strategy = Some(SHUFFLE_MERGE)))
      case None => Some(HintInfo(strategy = Some(SHUFFLE_MERGE)))
    }
    if (h.leftHint.exists(_.strategy.isDefined) ||
        h.rightHint.exists(_.strategy.isDefined)) h
    else JoinHint(f(h.leftHint), f(h.rightHint))
  }

  /** Plans this rule must leave alone: its own rewrites (`__graft_bin`),
    * its residue branches (`__graft_nobin`), and the engine's OWN binned
    * kernels (`__bin` — ops.IntervalJoin): once filter pushdown folds the
    * kernel's mode predicate into its (entity, __bin) equi-join, the
    * condition matches this rule's patterns, and re-binning an
    * already-binned join at best adds a useless layer and at worst (the
    * containment Union, whose branches DUPLICATE the child subtrees)
    * doubles the plan per kernel join until the optimizer crawls —
    * observed as a 20-minute ColumnPruning stall on q35's two-join
    * pipeline with the q53/q55 force flag set. A user column literally
    * named `__bin` is an accepted blind spot (documented here).
    */
  private def marker(p: LogicalPlan): Boolean =
    p.output.exists(a => a.name == "__graft_bin" || a.name == "__graft_nobin" ||
      a.name == "__bin")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint)
        if j.resolved &&
          (forced ||
            (l.stats.sizeInBytes > conf.autoBroadcastJoinThreshold &&
              r.stats.sizeInBytes > conf.autoBroadcastJoinThreshold)) &&
          !marker(l) && !marker(r) => // already rewritten / residue branch
      val conjuncts = splitConjunctivePredicates(cond)
      val eqs = conjuncts.filter {
        case EqualTo(a, b) => (sideOf(a, l, r), sideOf(b, l, r)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
        case _ => false
      }
      val ranges: Seq[(Expression, (Expression, Expression, Boolean))] =
        conjuncts.flatMap(c => normalize(c, l, r).map(n => (c, n)))
      val less = ranges.collectFirst {
        case (c, (a, b, isLess)) if isLess => (c, a, b) }
      val greater = ranges.collectFirst {
        case (c, (a, b, isLess)) if !isLess => (c, a, b) }
      (less, greater) match {
        case (Some((cLess, lStart, rEnd)), Some((cGreater, lEnd, rStart)))
            if eqs.nonEmpty && cLess != cGreater =>
          // a.start < b.end AND a.end > b.start with an entity equality:
          // the overlap pattern. Bin both sides on their own (start, end).
          val (lGen, lBin) = withBins(l, lStart, lEnd)
          val (rGen, rBin) = withBins(r, rStart, rEnd)
          val emitOnce = EqualTo(
            IntegralDivide(Greatest(Seq(toLong(lStart), toLong(rStart))),
              Literal(BinSize, LongType)),
            lBin)
          val newCond = (eqs :+ EqualTo(lBin, rBin)) ++
            conjuncts.filterNot(eqs.contains) :+ emitOnce
          logInfo(s"graft: rewrote interval theta join to (entity, bin) equi-join " +
            s"(bin=$BinSize, ${eqs.length} entity key(s))")
          Project(j.output, Join(lGen, rGen, Inner,
            Some(newCond.reduce(And)), shuffleMerge(hint)))
        case _ if eqs.nonEmpty =>
          containment(conjuncts, l, r) match {
            case Some((iLo, iHi, oLo, oHi, innerIsLeft)) =>
              rewriteContainment(j, l, r, hint, cond, conjuncts, eqs,
                iLo, iHi, oLo, oHi, innerIsLeft)
            case None => j
          }
        case _ => j
      }
  }

  /** Detect the CONTAINMENT pattern (VERDICT r4 #5 — Contained /
    * ContainsRegion-shaped SQL): two non-strict conjuncts
    *
    *   inner.lo >= outer.lo  AND  inner.hi <= outer.hi
    *
    * with the two inner expressions on one side of the join and the two
    * outer expressions on the other (either side may be the inner one —
    * `p contained-in f` and `f contains p` are the same shape with roles
    * swapped). Returns (innerLo, innerHi, outerLo, outerHi, innerIsLeft).
    */
  private def containment(conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression, Boolean)] = {
    val ges = conjuncts.flatMap(c => normalizeGe(c, l, r).map(n => (c, n)))
    (for {
      (c1, (iLo, oLo, s1)) <- ges.view  // c1: inner.lo >= outer.lo (big on s1)
      (c2, (oHi, iHi, s2)) <- ges.view  // c2: outer.hi >= inner.hi (big on s2)
      if (c1 ne c2) && s1 != s2
    } yield (iLo, iHi, oLo, oHi, s1)).headOption
  }

  /** Containment -> binned equi-join, with an exactness argument:
    *
    *  - each side explodes over its coordinate bins `sequence(lo div B,
    *    (hi-1) div B)` and the pair is emitted only where the INNER side's
    *    bin equals `innerLo div B` (the intersection-start bin — for a
    *    pattern-true pair innerLo = max(innerLo, outerLo));
    *  - `innerLo div B` is ALWAYS the first element of the inner side's
    *    own sequence, and for a WELL-FORMED inner (lo < hi) it lies inside
    *    the outer side's sequence too: outerLo <= innerLo (conjunct 1) and
    *    innerLo < innerHi <= outerHi (well-formed + conjunct 2) give
    *    outerLo div B <= innerLo div B <= (outerHi-1) div B;
    *  - both sequences are duplicate-free, so the pair is emitted at most
    *    once: EXACTLY-once for well-formed inners, and the original
    *    conjuncts are preserved so candidates never produce false rows.
    *
    * DEGENERATE inner rows (lo >= hi: empty/inverted intervals) satisfy the
    * raw predicates with an UNBOUNDED lo — e.g. inner (20000, 3) is
    * "contained" in outer (0, 10000) by plain arithmetic — and no
    * coordinate-bin scheme can cover them, so they take a RESIDUE branch:
    * the original join over just those rows (with a well-formed inner the
    * pattern makes a degenerate OUTER unsatisfiable — innerLo < innerHi <=
    * outerHi <= outerLo <= innerLo is a contradiction — so one residue
    * covers everything). Sane data has zero such rows and the residue join
    * sees an empty side; its inner child carries a `__graft_nobin` marker
    * column so this rule never re-matches it (the optimizer batch runs to
    * fixed point). The overlap pattern needs none of this: its strict
    * conjuncts bound every pattern-true pair, degenerate or not.
    */
  private def rewriteContainment(j: Join, l: LogicalPlan, r: LogicalPlan,
      hint: JoinHint, cond: Expression, conjuncts: Seq[Expression],
      eqs: Seq[Expression], iLo: Expression, iHi: Expression,
      oLo: Expression, oHi: Expression, innerIsLeft: Boolean): LogicalPlan = {
    val inner = if (innerIsLeft) l else r
    val wellFormed = LessThan(toLong(iLo), toLong(iHi))
    val (iGen, iBin) = withBins(Filter(wellFormed, inner), iLo, iHi)
    val (oGen, oBin) = withBins(if (innerIsLeft) r else l, oLo, oHi)
    val emitOnce = EqualTo(
      IntegralDivide(toLong(iLo), Literal(BinSize, LongType)), iBin)
    val newCond = (eqs :+ EqualTo(iBin, oBin)) ++
      conjuncts.filterNot(eqs.contains) :+ emitOnce
    val binned =
      if (innerIsLeft) Join(iGen, oGen, Inner, Some(newCond.reduce(And)), shuffleMerge(hint))
      else Join(oGen, iGen, Inner, Some(newCond.reduce(And)), shuffleMerge(hint))
    val marked = Project(
      inner.output :+ Alias(Literal(true), "__graft_nobin")(),
      Filter(Not(wellFormed), inner))
    val residue =
      if (innerIsLeft) Join(marked, r, Inner, Some(cond), hint)
      else Join(l, marked, Inner, Some(cond), hint)
    logInfo(s"graft: rewrote containment theta join to (entity, bin) equi-join " +
      s"(bin=$BinSize, ${eqs.length} entity key(s), inner=${if (innerIsLeft) "left" else "right"})")
    Union(Project(j.output, binned), Project(j.output, residue))
  }
}
