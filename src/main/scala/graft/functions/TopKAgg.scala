package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k with map-side truncation.
  *
  * The stock route to "top k rows per group" is a window
  * (`row_number() over (partition by g order by s)` + filter), which
  * shuffles EVERY row of every group to one reducer and sorts it there —
  * at 100 TB the hot group's partition is the job. This Aggregator keeps a
  * k-slot sorted buffer per group per partition and merges buffers, so the
  * exchange carries at most k·groups·partitions tiny rows and no reducer
  * ever sees more than k·partitions entries per group.
  *
  * Truncated merge under a TOTAL order (score desc, id asc — ids are
  * unique) is associative and commutative, so partial aggregation is safe:
  * any element of the true global top-k is in the top-k of whichever
  * buffer it landed in. Runs as an ObjectHashAggregate with partial merge
  * (PlanSpec pins this).
  *
  * Reference behavior mirrored: alphastats exposes head-style selection
  * only after full sorts; this is the scale-first equivalent.
  */
object TopKAgg {

  /** (score, id) pair; the order is score DESC then id ASC. */
  case class Entry(score: Double, id: Long)

  case class TopKBuf(var entries: Array[Entry])

  /** @param k number of entries kept per group (small; buffer is O(k)). */
  class BoundedTopK(k: Int) extends Aggregator[Entry, TopKBuf, Seq[Entry]] {
    require(k > 0, s"k must be positive, got $k")

    private def better(a: Entry, b: Entry): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    /** Insert `e` into the sorted (best-first) bounded buffer. Allocates
      * only while the buffer is still growing toward k; a full buffer
      * shifts in place, so the steady-state per-row cost is a branch on
      * the current k-th entry (no allocation).
      */
    private def insert(buf: Array[Entry], e: Entry): Array[Entry] = {
      if (buf.length >= k && !better(e, buf(buf.length - 1))) return buf
      if (buf.length == k) {
        // full: drop the last, shift the tail right, place e
        var i = k - 1
        while (i > 0 && better(e, buf(i - 1))) { buf(i) = buf(i - 1); i -= 1 }
        buf(i) = e
        return buf
      }
      val out = new Array[Entry](buf.length + 1)
      var i = 0
      while (i < buf.length && better(buf(i), e)) { out(i) = buf(i); i += 1 }
      out(i) = e
      var j = i + 1
      while (j < out.length) { out(j) = buf(j - 1); j += 1 }
      out
    }

    def zero: TopKBuf = TopKBuf(Array.empty)

    def reduce(b: TopKBuf, e: Entry): TopKBuf = {
      if (e != null) b.entries = insert(b.entries, e)
      b
    }

    def merge(a: TopKBuf, c: TopKBuf): TopKBuf = {
      // merge two sorted bounded arrays, keep the best k
      val x = a.entries; val y = c.entries
      if (y.isEmpty) return a
      if (x.isEmpty) { a.entries = y; return a }
      val out = new Array[Entry](math.min(x.length + y.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length) {
        if (i < x.length && (j >= y.length || better(x(i), y(j)))) {
          out(o) = x(i); i += 1
        } else { out(o) = y(j); j += 1 }
        o += 1
      }
      a.entries = out
      a
    }

    def finish(b: TopKBuf): Seq[Entry] = b.entries.toSeq

    def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder[TopKBuf]()
    def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
  }

  /** Top-k (score, id) entries per group, best-first (score desc, id asc).
    * Result is `array<struct<score:double,id:bigint>>`; `posexplode` it for
    * ranked rows. (The case-class input encoder flattens to two UDF
    * arguments — pass the columns, not a struct.)
    */
  def topK(score: Column, id: Column, k: Int): Column =
    udaf(new BoundedTopK(k)).apply(score, id)
}
