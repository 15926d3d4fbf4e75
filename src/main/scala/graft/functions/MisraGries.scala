package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items summary (Misra & Gries '82; mergeable
  * form per Agarwal et al., "Mergeable Summaries", PODS'12 — public
  * algorithms) as a Spark `Aggregator`: at most `k` counters per
  * buffer, so the exchange carries O(k · partitions) rows no matter
  * how large the key DOMAIN is — the point at 100 TB, where a plain
  * `groupBy(key).count` must shuffle the full distinct domain.
  *
  * Guarantee (the one callers rely on): each key's estimate
  * undercounts its true frequency by at most n/(k+1), so every key
  * with true count > n/(k+1) is PRESENT in the final summary. The
  * summary alone is approximate and partition-order-dependent;
  * [[graft.ops.HeavyHitters]] rescans to exact counts so its OUTPUT is
  * deterministic — the summary only prunes the domain.
  */
object MisraGries {

  /** (total rows seen, surviving keys, their residual estimates). */
  final case class MgSummary(n: Long, keys: Seq[String], ests: Seq[Long])

  final class MgBuf(var n: Long, val m: mutable.HashMap[String, Long])
    extends Serializable

  final class MgAgg(k: Int) extends Aggregator[String, MgBuf, MgSummary] {
    require(k >= 1, s"need k >= 1: $k")

    def zero: MgBuf = new MgBuf(0L, mutable.HashMap.empty)

    def reduce(b: MgBuf, a: String): MgBuf = {
      if (a == null) return b // nulls are not keys; rescan skips them too
      b.n += 1
      val cur = b.m.getOrElse(a, 0L)
      if (cur > 0L) b.m.update(a, cur + 1L)
      else if (b.m.size < k) b.m.update(a, 1L)
      else decrement(b.m, 1L) // classic MG: new key vs full table
      b
    }

    def merge(x: MgBuf, y: MgBuf): MgBuf = {
      x.n += y.n
      y.m.foreach { case (key, c) =>
        x.m.update(key, x.m.getOrElse(key, 0L) + c)
      }
      if (x.m.size > k) {
        // subtract the (k+1)-th largest count from all (the mergeable-
        // summaries rule): ≤ k survivors, total error stays ≤ n/(k+1)
        val vs = x.m.values.toArray.sorted(Ordering[Long].reverse)
        decrement(x.m, vs(k))
      }
      x
    }

    private def decrement(m: mutable.HashMap[String, Long], by: Long): Unit =
      m.filterInPlace((_, c) => c > by)
        .mapValuesInPlace((_, c) => c - by)

    def finish(b: MgBuf): MgSummary = {
      val entries = b.m.toArray.sortBy(_._1)
      MgSummary(b.n, entries.map(_._1).toSeq, entries.map(_._2).toSeq)
    }
    def bufferEncoder: Encoder[MgBuf] = Encoders.kryo[MgBuf]
    def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
  }

  /** struct(n, keys, ests): k-bounded frequent-items summary of a
    * string column.
    */
  def mg(c: Column, k: Int): Column = udaf(new MgAgg(k), Encoders.STRING).apply(c)
}
