package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator` — the UDAF extension point
  * (SURVEY §2.5/§7.3).
  *
  * vs. `row_number().over(Window.partitionBy(q).orderBy(...)) <= k`: the
  * window form shuffles EVERY candidate row to its key's reducer and sorts
  * there (Spark's WindowGroupLimit prunes per-partition, but rows still
  * move); this aggregator keeps at most k elements per key per map task —
  * partial aggregation combines heaps, so the shuffle carries k rows per
  * (key, partition) no matter how many candidates exist. At 100 TB with
  * k=5 that's the difference between shuffling the corpus and shuffling
  * kilobytes.
  *
  * Ordering: descending score, ascending id tie-break — identical to the
  * q50 window specification, so results are oracle-comparable.
  */
object TopKAggregator {

  /** (id, score) pairs in, top-k (id, score) list out, best first. */
  final case class Scored(id: Long, score: Double)

  def topK(k: Int): Aggregator[Scored, Seq[Scored], Seq[Scored]] =
    new Aggregator[Scored, Seq[Scored], Seq[Scored]] {
      private def better(a: Scored, b: Scored): Boolean =
        a.score > b.score || (a.score == b.score && a.id < b.id)

      // Buffer: sorted best-first, length <= k. Insertion into a <=k list
      // is O(k) — fine for the small k of a top-k query.
      private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] = {
        if (buf.size >= k && better(buf.last, x)) buf
        else {
          val (pre, post) = buf.span(better(_, x))
          (pre :+ x) ++ post.take(k - pre.size - 1)
        }
      }

      def zero: Seq[Scored] = Vector.empty
      def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = insert(buf, x)
      def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
        b.foldLeft(a)(insert)
      def finish(buf: Seq[Scored]): Seq[Scored] = buf
      def bufferEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
      def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
    }

  /** Same aggregator shaped for (qid, id, score) rows, so it can be used
    * directly as the TypedColumn of a `groupByKey(_._1).agg(...)`. */
  def topKOfRow(k: Int): Aggregator[(Long, Long, Double), Seq[Scored], Seq[Scored]] =
    new Aggregator[(Long, Long, Double), Seq[Scored], Seq[Scored]] {
      private val inner = topK(k)
      def zero: Seq[Scored] = inner.zero
      def reduce(buf: Seq[Scored], x: (Long, Long, Double)): Seq[Scored] =
        inner.reduce(buf, Scored(x._2, x._3))
      def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = inner.merge(a, b)
      def finish(buf: Seq[Scored]): Seq[Scored] = buf
      def bufferEncoder: Encoder[Seq[Scored]] = inner.bufferEncoder
      def outputEncoder: Encoder[Seq[Scored]] = inner.outputEncoder
    }
}
