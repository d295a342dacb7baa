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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint)
        if j.resolved &&
          (forced ||
            (l.stats.sizeInBytes > conf.autoBroadcastJoinThreshold &&
              r.stats.sizeInBytes > conf.autoBroadcastJoinThreshold)) &&
          !l.output.exists(_.name == "__graft_bin") => // already rewritten
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
            Some(newCond.reduce(And)), hint))
        case _ => j
      }
  }
}
