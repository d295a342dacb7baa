package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Immutable in-memory interval index for the broadcast join path.
  *
  * Spark-native analog of the reference's per-seqid centered interval tree
  * (reference: src/utils/tree.rs:30-64 build, tree.rs:96-121 range probe,
  * tree.rs:66-94 point probe). Instead of a centered tree we use
  * start-sorted arrays plus a max-end segment tree: a range probe descends
  * the tree pruning subtrees whose max(end) <= qstart and whose min(start)
  * >= qend, giving O(log n + k) like the reference.
  *
  * Semantics parity:
  *  - range probe is half-open strict: `start < qend && end > qstart`
  *    (tree.rs:96-121);
  *  - point probe on half-open intervals: `start <= p && p < end`; the
  *    reference's closed point test (tree.rs:66-94) operates pre-normalized
  *    closed coords — after the 1-closed -> 0-half-open normalization
  *    (index_builder/core.rs:108-109) the two agree.
  *
  * `payload(i)` is an opaque row index into whatever the caller broadcast.
  */
final class IntervalIndex private (
    val starts: Array[Long],
    val ends: Array[Long],
    val payload: Array[Int],
    maxEndTree: Array[Long]) extends Serializable {

  def size: Int = starts.length

  /** All i with starts(i) < qend && ends(i) > qstart (half-open overlap). */
  def queryRange(qstart: Long, qend: Long): ArrayBuffer[Int] = {
    val out = new ArrayBuffer[Int]()
    if (size > 0) descend(1, 0, size - 1, qstart, qend, out)
    out
  }

  /** All i whose interval contains point p (half-open). */
  def queryPoint(p: Long): ArrayBuffer[Int] = queryRange(p, p + 1)

  // Segment tree over [lo,hi] of index positions; node holds max end.
  private def descend(node: Int, lo: Int, hi: Int, qs: Long, qe: Long,
      out: ArrayBuffer[Int]): Unit = {
    if (maxEndTree(node) <= qs) return         // nothing in subtree ends after qs
    if (starts(lo) >= qe) return               // starts sorted: whole subtree starts at/after qe
    if (lo == hi) { out += payload(lo); return }
    val mid = (lo + hi) >>> 1
    descend(node * 2, lo, mid, qs, qe, out)
    descend(node * 2 + 1, mid + 1, hi, qs, qe, out)
  }
}

object IntervalIndex {
  /** Build from (start, end, payloadIdx) triples; sorts by start. */
  def build(items: Array[(Long, Long, Int)]): IntervalIndex = {
    val sorted = items.sortBy(t => (t._1, t._2))
    val n = sorted.length
    val starts = new Array[Long](n)
    val ends = new Array[Long](n)
    val pay = new Array[Int](n)
    var i = 0
    while (i < n) { starts(i) = sorted(i)._1; ends(i) = sorted(i)._2; pay(i) = sorted(i)._3; i += 1 }
    val tree = new Array[Long](math.max(4 * n, 1))
    if (n > 0) buildTree(tree, ends, 1, 0, n - 1)
    new IntervalIndex(starts, ends, pay, tree)
  }

  private def buildTree(tree: Array[Long], ends: Array[Long], node: Int, lo: Int, hi: Int): Long = {
    if (lo == hi) { tree(node) = ends(lo); ends(lo) }
    else {
      val mid = (lo + hi) >>> 1
      val m = math.max(buildTree(tree, ends, node * 2, lo, mid),
        buildTree(tree, ends, node * 2 + 1, mid + 1, hi))
      tree(node) = m
      m
    }
  }
}
