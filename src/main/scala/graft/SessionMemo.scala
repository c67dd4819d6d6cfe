package graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** Per-SparkContext memo of derived values (checkpointed frames, stage
  * bundles) — the shared container behind the family memos
  * (Dedup.frameMemo, Similarity.bitextSideMemo, Curation.stageMemo,
  * Multimodal's and SimilarityFitted's stage memos).
  *
  * Why an outer per-context layer (r15 ADVICE): a flat
  * `ConcurrentHashMap[String, DataFrame]` keyed by
  * `applicationId@dir@stage` holds strong references for the JVM's
  * lifetime, so entries referencing STOPPED SparkContexts accumulate —
  * a test suite that builds many sessions retains every dead context's
  * checkpointed frames (and through each DataFrame, its whole
  * SessionState). Scoping the outer map by [[SparkContext]] keeps
  * today's sharing semantics exactly — all sibling `newSession()`s of
  * one context share entries, two contexts never do — and the
  * stopped-context sweep in [[inner]] makes a dead context's whole
  * entry set collectible (the weak keys alone cannot: see the sweep's
  * scaladoc for the value→key self-pinning trap).
  *
  * The inner keys keep the established `applicationId@dir@stage`
  * format: [[Tables.keyCoversTables]]/[[Tables.keyCoversPath]] parse
  * that shape in the invalidation hooks, and the appId prefix (now
  * redundant under context scoping) keeps every existing key-format
  * consumer and DedupSpec's cross-root pins true without change.
  *
  * Conf capture (r15 ADVICE, documented contract): a memoized frame is
  * materialized under the FIRST caller's session conf — a caller that
  * checkpoints under a test-local override (ScaleSpec's 512 KB
  * maxPartitionBytes) hands that materialization to every later
  * same-context caller of the same key. That is the memo trade
  * everywhere in this repo: values must be DETERMINISTIC results, and
  * conf knobs that change only HOW they materialize (partition sizing)
  * are acceptable to capture; callers that need conf-pristine frames
  * use a fresh context or an unmemoized builder. */
final class SessionMemo[V] {

  private val outer = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkContext,
      java.util.concurrent.ConcurrentHashMap[String, V]]())

  /** Deterministic eviction of dead contexts' entries. The weak keys
    * alone CANNOT collect them: a memoized DataFrame references its
    * SparkSession, which references the SparkContext — the value chain
    * strongly reaches the key, the documented WeakHashMap self-pinning
    * case. Explicitly dropping stopped contexts' inner maps breaks
    * that chain, after which everything is ordinarily collectible.
    * Called on every lookup — the outer map holds a handful of
    * contexts at most, so the sweep is O(contexts), not O(entries). */
  private def sweepStopped(): Unit = outer.synchronized {
    val it = outer.keySet.iterator()
    while (it.hasNext) if (it.next().isStopped) it.remove()
  }

  private def inner(
      sc: SparkContext): java.util.concurrent.ConcurrentHashMap[String, V] =
    outer.synchronized {
      sweepStopped()
      Option(outer.get(sc)).getOrElse {
        val m = new java.util.concurrent.ConcurrentHashMap[String, V]()
        outer.put(sc, m)
        m
      }
    }

  /** Memoized `f` per (live context of `s`, `key`) — atomic per key,
    * recorded only if `f` succeeds (computeIfAbsent's contract). */
  def getOrCompute(s: SparkSession, key: String)(f: => V): V =
    inner(s.sparkContext).computeIfAbsent(key, _ => f)

  /** Drop every entry (across all live contexts) whose key satisfies
    * `p` — the invalidation-hook hook point ([[Tables.onInvalidate]]). */
  def invalidateKeys(p: String => Boolean): Unit = outer.synchronized {
    outer.values.forEach { m =>
      val it = m.keySet.iterator()
      while (it.hasNext) if (p(it.next())) it.remove()
    }
  }
}
