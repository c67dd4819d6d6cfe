package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-inventory plan audit — the automated version of "explain every
  * operator and make sure it's the plan you'd want at 100 TB":
  *
  *  - no CartesianProduct anywhere (an unconstrained cartesian is always
  *    a bug at scale; even cross_join must ride a broadcast);
  *  - BroadcastNestedLoopJoin only where a deliberately tiny side exists
  *    (cross_join, the broadcast query-vector similarity queries);
  *  - shuffle (Exchange) count bounded per query — a regression that
  *    sneaks an extra exchange into a hot query shows up here, not in
  *    production.
  */
class PlanAuditSpec extends AnyFunSuite with SparkSuite {

  // queries whose semantics legitimately need a nested-loop over a
  // broadcast side (single-row query vector / tiny cross)
  private val bnljAllowed = Set(
    "cross_join", "sim_topk_cosine", "sim_range_search",
    "sim_topk_pq", // broadcast query row + ADC table cross (TakeOrdered)
    "sim_ann_lsh", "sim_ann_ivf",
    "sim_topk_projected", // broadcast single-row query vector cross
    "multimodal_join", "multimodal_embed", "knn_classify", "watermark_late",
    "multimodal_embed_pixels", // broadcast query feature-vector cross
    "streaming_dedup",
    "text_tfidf", "null_handling",
    "text_bm25", "heavy_hitters", // broadcast single-row corpus stats
    "text_keywords", // broadcast single-row doc count (tfidf family)
    "dedup_near_keep", // broadcast single-row max-cluster agg
    "dedup_embedding_ann", // broadcast single-row fitted-centroid array
    "dedup_embedding_ann_keep", // same, + the single-row max-cluster cross
    "dedup_embedding_incremental", // broadcast single-row centroid array
    "sim_ann_ivf_fitted", // broadcast centroid-array row + 8-row probe frame
    "sim_ann_catalog_served", // the served twin: broadcast persisted-cents
    // row crossed into the single query row's probe frame (r15)
    "sim_ann_batch", // broadcast centroid-array row + 25-probe pcell frame
    "sim_hard_negatives", // broadcast single-row fitted-centroid array
    // (r13: the mining gate moved off the fixed constant-folded cells)
    "knn_classify_ann", // broadcast centroid-array row + probe×pcell frame
    "sim_topk_pq_fitted", // broadcast refit-books row + query ADC table cross
    "sim_ann_ivfpq_fitted", // broadcast centroid-array + refit-books rows
    "tpch_q22", // broadcast single-row avg-acctbal scalar, non-equi compare
    "tpch_q11", // broadcast single-row inventory-value cut scalar
    "feature_minmax", // broadcast single-row global-stats join (no condition)
    "merge_upsert", // broadcast single-row max-key scalar for insert keys
    "mix_rebalance", // broadcast single-row uniform-target scalar cross
    "event_funnel", // cross of four single-row stage-count frames
    "agg_chi2", // broadcast single-row (n, k) totals cross
    "time_resample_ffill", // distinct-keys × 48-bucket grid cross (tiny)
    "time_resample_interp", // same grid scaffold
    "text_unigram_nll", // broadcast single-row token-total scalar cross
    "cooccur_pmi", // broadcast single-row doc-count scalar cross
    "target_encode", // broadcast single-row global-prior scalar cross
    "dq_expectations", // broadcast single-row orphan-count scalar cross
    "dq_expectations_approx", // same scaffold, sketch-backed uniqueness
    "text_nb_train", // broadcast single-row vocab-size + doc-total scalars
    "mix_importance_weights", // broadcast single-row corpus-totals cross
    // feeding the 1024-row λ model (DSIR)
    "mix_temperature", // broadcast single-row (total, sqrt-sum) normalizer
    "mix_epochs", // same single-row budget/normalizer scalar cross
    "stream_psi_monitor", // broadcast single-row d0/ref-total scalars +
    // the |windows| x |buckets| grid cross (both frames model-sized)
    "text_bigram_nll", // broadcast single-row (N, V) smoothing scalars
    "text_nb_classify", // same two training scalars feed the scoring fan-out
    "stream_nb_classify", // same scoring scaffold under the stream monitor
    "stream_curation", // same NB scalars + the broadcast mix normalizers
    "multimodal_pca_fit", // broadcast single-row iterate-norm scalar cross
    "dq_volume_anomaly", // broadcast single-row window-stats scalar cross
    "dq_psi", // broadcast single-row midpoint + side-total scalar crosses
    "dq_embedding_drift", // broadcast centroid-array row + the single-row
    // |cells|/side-total smoothing scalars (the dq_psi scaffold on the
    // fitted quantizer)
    "curation_pipeline_e2e") // the report assembly: nine broadcast
    // single-row stage-count/metric scalar crosses (every corpus-sized
    // exchange lives behind the stages' lineage-cut ID frames)

  private val maxShuffles = 6

  /** Iterative algorithms legitimately shuffle per round; their frames
    * are domain-cardinality (the derived supplier graph), never the
    * corpus, so the exchanges stay cheap at any scale. */
  private val shuffleCapOverride = Map(
    "graph_pagerank" -> 10, // 3 rounds × (join + re-agg) over the graph
    // the vertex-restricted component loop added the singleton-rejoin
    // (corpus ⋈ label-cardinality frame, AQE-broadcastable — exchanges
    // over graph-vertex data, never corpus text)
    "dedup_near_keep" -> 8,
    // NB training/scoring is a multi-aggregate pipeline: beyond the one
    // corpus-sized count shuffle (checkpointed model table), every
    // exchange is class- or vocab-bounded (class totals, vocab-size
    // distinct, priors, the top-k window, the (doc, class) score agg)
    "text_nb_train" -> 8,
    "text_nb_classify" -> 10,
    // the monitor adds one |classes|-row final aggregate on top of the
    // classify scaffold
    "stream_nb_classify" -> 11,
    // the composed curation pipeline = the classify scaffold plus the
    // quarantine-count aggregate, the (route, lang) domain-cardinality
    // route aggregate, and the output sort — every added exchange is
    // domain- or single-row-sized
    "stream_curation" -> 14,
    // unmemoized end-to-end: cell-gated candidate join + pair distinct
    // + two id re-joins for the exact-cosine verify + the singleton
    // rejoin and the summary aggregates — every exchange past the
    // candidate join is candidate-/label-cardinality (the loop's
    // per-round exchanges are behind localCheckpoint lineage cuts)
    "dedup_embedding_ann_keep" -> 9,
    // unmemoized end-to-end like ann_keep: the near-dup candidate +
    // verify + component pipeline's exchanges, then the label-keyed
    // cluster-size count, the label-cardinality rejoin and the output
    // sort — nothing past the candidate join carries corpus text
    "mix_dedup_weights" -> 9)

  /** The sf-proportional dimensions (customer/supplier/part) carry NO
    * broadcast hint — at 100 TB a forced broadcast OOMs every executor.
    * At test scale the cost-based planner (or AQE's runtime demotion)
    * must still arrive at a broadcast-hash join on its own; this pins
    * that the strategy choice is size-driven, not hint-driven. */
  private val unhintedBroadcastJoins = Seq(
    "join_inner", "join_multi", "join_5way",
    "tpch_q3", "tpch_q5", "tpch_q7", "tpch_q8",
    "tpch_q10", "tpch_q14", "tpch_q18",
    "stream_enrich") // sf-proportional customer dim, hint-free

  unhintedBroadcastJoins.foreach { name =>
    test(s"$name: planner picks broadcast-hash join unhinted at test scale") {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // materialize so AQE finalizes the adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: expected a size-driven BroadcastHashJoin at test scale:\n" +
          plan.take(1500))
    }
  }

  SparkEntry.allDecls.foreach { decl =>
    test(s"${decl.name}: plan is scale-sane") {
      val plan = decl.fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${decl.name} plans a cartesian product:\n${plan.take(1200)}")
      if (!bnljAllowed(decl.name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${decl.name} plans a nested-loop join:\n${plan.take(1200)}")
      // count shuffles only — BroadcastExchange is the cheap kind we
      // *want* (it's how dimensions avoid shuffling the fact side)
      val shuffles = "Exchange (hash|range|Single)".r.findAllIn(plan).size
      val cap = shuffleCapOverride.getOrElse(decl.name, maxShuffles)
      assert(shuffles <= cap,
        s"${decl.name} plans $shuffles shuffle exchanges (> $cap)")
    }
  }
}
