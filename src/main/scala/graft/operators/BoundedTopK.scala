package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k Aggregator, generic over the row payload: keeps the
  * best k elements under `better`, with map-side partial merge — the
  * buffer never exceeds k, so a billion-row group shuffles as k rows
  * per input partition per group. k is single-digit at every use site,
  * so the sort-take merge beats real heap bookkeeping.
  *
  * The one implementation behind grouped top-k rows
  * (`Relational.topkPerGroup`), per-lang tf-idf terms
  * (`TextAnalysis.tfidfTopTerms`), and per-probe neighbor ranking
  * (`similarity.Similarity`) — anywhere a window over a
  * low-cardinality partition key would funnel the whole table into a
  * handful of reducers. `better` must be a strict total order (ties
  * broken by a unique id) for deterministic, oracle-matching output. */
class BoundedTopK[T](k: Int, better: (T, T) => Boolean)(
    implicit enc: Encoder[Seq[T]])
    extends Aggregator[T, Seq[T], Seq[T]] {
  def zero: Seq[T] = Vector.empty
  def reduce(buf: Seq[T], r: T): Seq[T] = merge(buf, Vector(r))
  def merge(x: Seq[T], y: Seq[T]): Seq[T] = (x ++ y).sortWith(better).take(k)
  def finish(buf: Seq[T]): Seq[T] = buf
  def bufferEncoder: Encoder[Seq[T]] = enc
  def outputEncoder: Encoder[Seq[T]] = enc
}
