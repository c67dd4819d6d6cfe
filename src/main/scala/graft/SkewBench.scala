package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical skew stress of the LSH oversized-bucket guard (round-6
  * verdict item 4): replicate one document 10^4× on top of the sf0.1
  * corpus and run candidate generation + Jaccard verify end-to-end.
  * Without [[queries.Dedup.BucketCap]] routing, the replica bucket
  * would concentrate a 5×10^7-pair expansion inside a single
  * collect_list row/task (one straggler pinning the stage, or OOM);
  * with it, the expansion is a shuffle-parallel self-join AQE can
  * skew-split. Prints per-stage timing + the max/mean task-time ratio
  * of the heaviest stage as the straggler witness. Not part of the
  * driver contract; BASELINE.md records the measured numbers.
  *
  * Run: java -cp "target/scala-2.13/classes:<spark jars>" graft.SkewBench [nReplicas]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[skew] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // per-stage task-time skew via a listener: straggler evidence is
    // max-task/mean-task of the heaviest stage, not just wall-clock
    val stageMax = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val dur = t.taskInfo.duration
        stageMax.merge(t.stageId, (dur, dur, 1),
          (a, b) => (math.max(a._1, b._1), a._2 + b._2, a._3 + 1))
      }
    })
    val rep = spark.range(n).select(
      (col("id") + 10000000L).as("doc_id"),
      lit("skew skew skew the same payload replicated many times over").as("text"),
      lit("en").as("lang"), lit(58).as("n_chars"))
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .unionByName(rep)
      .filter(col("text").isNotNull)
    val banded = tm("signature+bands") {
      val b = queries.Dedup.bands(queries.Dedup.sigArray(docs)); b.count(); b
    }
    val (small, big) = tm("splitBuckets (checkpoint)") {
      queries.Dedup.splitBuckets(banded, Seq("band", "bhash"))
    }
    tm("branch counts") {
      println(s"[skew] small-branch rows = ${small.count()}, " +
        s"big-branch rows = ${big.count()} (both MUST be non-empty)")
    }
    val cand = tm("candidatePairs total") { queries.Dedup.candidatePairs(docs) }
    val nc = tm("candidate count") { cand.count() }
    println(s"[skew] n_candidates = $nc (expected ≈ corpus pairs + ${n.toLong * (n - 1) / 2})")
    val worst = stageMax.values.toArray.map(_.asInstanceOf[(Long, Long, Int)])
      .filter(_._3 > 1).sortBy(-_._2).take(3)
    worst.foreach { case (mx, sum, cnt) =>
      val mean = sum.toDouble / cnt
      println(f"[skew] heavy stage: tasks=$cnt%d mean=${mean / 1000}%.2fs " +
        f"max=${mx / 1000.0}%.2fs max/mean=${mx / mean}%.2f")
    }
    spark.stop()
  }
}
