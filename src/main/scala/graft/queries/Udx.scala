package graft.queries

import graft.{Decl, Tables}
import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deliberate user-defined extension points (SURVEY.md §2 rows B33-B35):
  * scalar UDF, typed Aggregator (the 1:1 analogue of dask's
  * `Aggregation(chunk, agg, finalize)` partial/merge/final triple), and
  * a one-to-many UDTF via typed flatMap.
  *
  * These exist to prove the extension surface — production operators in
  * this repo prefer codegen'd built-ins (see Scalars/Text modules); each
  * query here has a built-in-only oracle showing the UDF result is
  * reproducible without one. UDFs break whole-stage codegen locally but
  * still run distributed (no driver-side loops, no collect).
  */
object Udx {

  /** B34: sum-of-squares / count — buffer is (sum, n); merge is
    * associative+commutative, so partial aggregation (map-side combine)
    * stays correct at any partition count. Longs, so exact. */
  object MeanSquare extends Aggregator[Long, (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: Long): (Long, Long) = (b._1 + a * a, b._2 + 1)
    def merge(l: (Long, Long), r: (Long, Long)): (Long, Long) =
      (l._1 + r._1, l._2 + r._2)
    def finish(b: (Long, Long)): Double =
      if (b._2 == 0) 0.0 else b._1.toDouble / b._2
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** One (score, key) candidate for [[TopK]]. Field order = udaf call
    * argument order. */
  case class Scored(score: Double, key: Long)

  /** Bounded per-group top-k as a true AGGREGATE. The window
    * `row_number() <= k` formulation fully sorts every partition of
    * every group before discarding all but k rows; this buffer keeps at
    * most k entries, reduces in O(k) per row, and — being an aggregate —
    * gets map-side partial combine for free, so only ≤ k rows per group
    * per partition ever reach the shuffle. That is the top-k-per-key
    * plan that survives 100 TB. Total order (score DESC, key ASC) makes
    * the result deterministic; the oracle is the window formulation. */
  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.key < b.key)
    // buffer invariant: sorted by `better`, size ≤ k
    private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] = {
      val i = buf.indexWhere(e => better(x, e))
      if (i < 0) { if (buf.size < k) buf :+ x else buf }
      else ((buf.take(i) :+ x) ++ buf.drop(i)).take(k)
    }
    def zero: Seq[Scored] = Vector.empty
    def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = insert(buf, x)
    def merge(l: Seq[Scored], r: Seq[Scored]): Seq[Scored] =
      r.foldLeft(l)(insert)
    def finish(b: Seq[Scored]): Seq[Scored] = b
    def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def decls: Seq[Decl] = Seq(

    // B34b + B18-at-scale: top-3 orders per customer via the bounded
    // TopK aggregate instead of a window sort (see [[TopK]]).
    Decl("window_topk_agg",
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val tk = udaf(new TopK(3), Encoders.product[Scored])
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(tk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("o_custkey"), (col("pos") + 1).as("rn"),
          col("t.key").as("o_orderkey"), col("t.score").as("o_totalprice"))
        .orderBy("o_custkey", "rn")
    },

    // B33: scalar UDF — whitespace token count per document.
    Decl("udf_token_count",
      // the UDF defines token_count(NULL) = 0 (a missing doc has no
      // tokens) — the oracle COALESCEs DuckDB's NULL-in-NULL-out to
      // match. Non-null text follows split semantics exactly (both
      // engines give '' -> [''] -> 1), no special empty-string case.
      """SELECT doc_id, COALESCE(len(string_split(text, ' ')), 0) AS n_tok
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val nTok = udf((t: String) =>
        if (t == null) 0 else t.split(" ", -1).length)
      Tables.documents(s, d)
        .select(col("doc_id"), nTok(col("text")).as("n_tok"))
        .orderBy("doc_id")
    },

    // B34: typed Aggregator over grouped data.
    Decl("udaf_mean_square",
      """SELECT lang, CAST(SUM(n_chars * n_chars) AS DOUBLE) / COUNT(*)
        |  AS mean_sq_chars, COUNT(*) AS n
        |FROM documents GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
      val ms = udaf(MeanSquare, Encoders.scalaLong)
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(ms(col("n_chars")).as("mean_sq_chars"), count(lit(1)).as("n"))
        .orderBy("lang")
    },

    // B: groupby().apply — dask/pandas' arbitrary-function-per-group,
    // as a typed mapGroups over KeyValueGroupedDataset: each customer's
    // orders arrive as one iterator, the closure computes the largest
    // gap between consecutive orders. Same contract as the reference:
    // ONE GROUP must fit in memory (the group, not the partition) —
    // fine for per-key cardinalities, never used for global state.
    // The oracle proves the closure result is reproducible relationally.
    Decl("group_apply",
      """WITH g AS (
        |  SELECT o_custkey, epoch_us(o_orderdate) AS us,
        |    lag(epoch_us(o_orderdate)) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders)
        |SELECT o_custkey, COUNT(*) AS n_orders,
        |  COALESCE(MAX(us - prev), -1) AS max_gap_us
        |FROM g GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
      import s.implicits._
      // o_orderdate is TIMESTAMP_NTZ; the NTZ→TIMESTAMP cast reads the
      // session timezone, so pin UTC to make naive-as-UTC epoch µs ==
      // DuckDB's epoch_us of the naive value (same shim as Tables.events)
      s.conf.set("spark.sql.session.timeZone", "UTC")
      Tables.orders(s, d)
        .select(col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
          col("o_orderkey"))
        .as[(Long, Long, Long)]
        .groupByKey(_._1)
        .mapGroups { (k, it) =>
          val sorted = it.toArray.sortBy(t => (t._2, t._3))
          val gaps = sorted.iterator.sliding(2).withPartial(false)
            .map(w => w(1)._2 - w(0)._2).toSeq
          (k, sorted.length.toLong, if (gaps.isEmpty) -1L else gaps.max)
        }
        .toDF("o_custkey", "n_orders", "max_gap_us")
        .orderBy("o_custkey")
    },

    // B35: UDTF — one-to-many row expansion via typed flatMap (tokens per
    // doc), then a distributed count by language.
    Decl("udtf_tokens",
      """SELECT lang, COUNT(*) AS n_tokens FROM (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(col("lang"), col("text")).as[(String, String)]
        // null text generates no rows — same as unnest(NULL) in the oracle
        .flatMap { case (lang, text) =>
          if (text == null) Nil
          else text.split(" ", -1).map(t => (lang, t)).toSeq }
        .toDF("lang", "tok")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"))
        .orderBy("lang")
    },

    // B: cogroup — dask/pandas' align-two-frames-per-key with arbitrary
    // logic over BOTH groups at once (`KeyValueGroupedDataset.cogroup`):
    // per customer, the order iterator and a high-value-order iterator
    // arrive together and the closure reconciles them — here an audit
    // counting orders, flagged orders, and flagged value share. Scale
    // contract mirrors group_apply: both sides hash-shuffle on the key,
    // each KEY's groups (not partitions) must fit in memory. The oracle
    // proves the closure reproducible as a full-outer relational agg.
    Decl("cogroup_apply",
      """WITH o AS (SELECT o_custkey AS k, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS VARCHAR)
        |      AS total_s
        |  FROM orders GROUP BY o_custkey),
        |f AS (SELECT o_custkey AS k, COUNT(*) AS n_flagged
        |  FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey)
        |SELECT o.k AS c_custkey, o.n_orders,
        |  COALESCE(f.n_flagged, 0) AS n_flagged,
        |  CAST(total_s AS DOUBLE) AS total_price
        |FROM o LEFT JOIN f ON o.k = f.k
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      import s.implicits._
      val base = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_totalprice"))
        .as[(Long, Double)]
      val all = base.groupByKey(_._1)
      val flagged = base.filter(_._2 > 400000).groupByKey(_._1)
      all.cogroup(flagged) { (k, os, fs) =>
        var n = 0L
        var acc = JBigDecimal.ZERO
        os.foreach { o =>
          n += 1
          acc = acc.add(JBigDecimal.valueOf(o._2)
            .setScale(6, RoundingMode.HALF_UP))
        }
        // a key with no base orders never appears (flagged ⊆ all)
        if (n == 0) Iterator.empty
        else Iterator((k, n, fs.size.toLong, acc.doubleValue()))
      }
        .toDF("c_custkey", "n_orders", "n_flagged", "total_price")
        .orderBy("c_custkey")
    }
  )
}
