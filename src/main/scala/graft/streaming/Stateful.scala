package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators (SURVEY §2.3/§2.4 stateful rows):
  * snapshot ring buffers, throttle token buckets, trace tail sampling —
  * each a flatMapGroupsWithState design with bounded state
  * (the reference bounds by pages/records, flb_sp_snapshot.c:110-180;
  * we bound identically and let watermarks/timeouts evict).
  */
object Stateful {

  // ------------------------------------------------------------ snapshot

  final case class Rec(tag: String, tsSec: Long, body: String)
  final case class SnapshotState(buffer: List[Rec])

  /** CREATE SNAPSHOT / FLUSH SNAPSHOT (flb_sp.c:403-432): per-tag ring
    * buffer bounded by `maxRecords` and `seconds`; when `flushWhen`
    * matches an incoming record, the buffered records are re-emitted.
    * Ring CONTENT is bounded, but tag cardinality is not — a dead tag's
    * state evicts after `idleTimeoutMs` of processing-time silence
    * (round-2 review: NoTimeout kept dead-tag state forever).
    */
  def snapshotFlush(spark: SparkSession, recs: Dataset[Rec],
                    maxRecords: Int, seconds: Long,
                    flushWhen: Rec => Boolean,
                    idleTimeoutMs: Long = 60000): Dataset[Rec] = {
    import spark.implicits._
    recs.groupByKey(_.tag)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (_: String, it: Iterator[Rec], state: GroupState[SnapshotState]) => {
          if (state.hasTimedOut) {
            // dead tag: discard the ring (a snapshot only emits on FLUSH)
            state.remove()
            Iterator.empty
          } else {
            var buf = state.getOption.map(_.buffer).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer[Rec]()
            it.toSeq.sortBy(_.tsSec).foreach { r =>
              if (flushWhen(r)) {
                out ++= buf.reverse
                buf = Nil
              }
              buf = (r :: buf)
                .filter(_.tsSec > r.tsSec - seconds)
                .take(maxRecords)
            }
            state.update(SnapshotState(buf))
            state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
        })
  }

  // ------------------------------------------------------------ throttle

  final case class BucketState(paneStart: Long, emitted: Long)

  /** filter_throttle streaming twin (throttle.c:190): token bucket per
    * key — at most `rate` records per `paneSeconds`, decided on
    * event-time; excess records drop (the reference drops, not delays).
    * Per-key state is one (pane, counter) pair, but key cardinality is
    * unbounded — idle keys evict after `idleTimeoutMs` (an evicted key
    * restarts with a fresh pane, which only ever ADMITS records the old
    * counter might have dropped; matches the reference pruning stale
    * panes from its window table, window.c:58-105).
    */
  def throttle(spark: SparkSession, recs: Dataset[Rec], rate: Long,
               paneSeconds: Long, idleTimeoutMs: Long = 60000): Dataset[Rec] = {
    import spark.implicits._
    recs.groupByKey(_.tag)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (_: String, it: Iterator[Rec], state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(BucketState(Long.MinValue, 0))
            val out = scala.collection.mutable.ArrayBuffer[Rec]()
            it.toSeq.sortBy(_.tsSec).foreach { r =>
              val pane = r.tsSec - (r.tsSec % paneSeconds)
              if (pane != st.paneStart) st = BucketState(pane, 0)
              if (st.emitted < rate) {
                out += r
                st = st.copy(emitted = st.emitted + 1)
              }
            }
            state.update(st)
            state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
        })
  }

  // ---------------------------------------------------- sequence packing

  final case class Doc(shard: Int, docId: Long, nTokens: Long)
  final case class PackedDoc(shard: Int, docId: Long, tokBegin: Long,
                             tokEnd: Long, firstSeq: Long, lastSeq: Long)
  final case class PackState(nextTok: Long)

  /** Streaming twin of [[graft.text.TextAnalysis.packSequences]]: online
    * concat-and-chunk — each shard keeps ONE cursor (the next free token
    * offset) and every arriving document is assigned its token interval
    * and first/last sequence ids as it lands. State is a single long per
    * shard — bounded by construction, so NoTimeout is safe (nothing to
    * evict; a shard's cursor IS the packing position and must survive
    * forever). Within a micro-batch, documents pack in deterministic
    * (md5(docId), docId) order — the same priority order as the batch
    * operator — so a replayed batch packs identically.
    */
  def packStream(spark: SparkSession, docs: Dataset[Doc],
                 seqLen: Int): Dataset[PackedDoc] = {
    import spark.implicits._
    require(seqLen > 0)
    docs.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (shard: Int, it: Iterator[Doc], state: GroupState[PackState]) => {
          var next = state.getOption.map(_.nextTok).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer[PackedDoc]()
          priorityOrder(it)(_.docId).foreach { d =>
            val begin = next
            val end = begin + d.nTokens
            // the max() guards nTokens=0 (unreachable from the batch
            // twin, whose tokenizer emits >=1): an empty doc sits AT the
            // cursor, occupying [begin, begin) in sequence begin/seqLen
            out += PackedDoc(shard, d.docId, begin, end,
              begin / seqLen, math.max(begin, end - 1) / seqLen)
            next = end
          }
          state.update(PackState(next))
          out.iterator
        })
  }

  final case class HashedDoc(hash: String, docId: Long)
  final case class SeenState(keeperId: Long, dups: Long)

  /** Streaming twin of [[graft.dedup.Dedup.exact]]: online exact
    * deduplication — the first document carrying a given content hash
    * survives, every later arrival (same batch or any future batch) is
    * dropped. Within a micro-batch the lowest docId wins, matching the
    * batch operator's canonical-representative rule, so replaying a
    * batch dedups identically. State per DISTINCT hash is one (long,
    * long) — the 16-byte key plus 16 bytes, never the document body,
    * the same "shuffle hashes, not bodies" contract as the batch path.
    * NoTimeout is deliberate: a hash's seen-flag IS the dedup contract
    * and must survive the stream's lifetime (bounded retention = run
    * per-epoch streams or snapshot-reset the checkpoint; an eviction
    * timeout would silently re-admit duplicates).
    */
  def dedupStream(spark: SparkSession,
                  docs: Dataset[HashedDoc]): Dataset[HashedDoc] = {
    import spark.implicits._
    docs.groupByKey(_.hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (hash: String, it: Iterator[HashedDoc],
         state: GroupState[SeenState]) => {
          val ids = it.map(_.docId).toSeq
          state.getOption match {
            case Some(s) =>
              state.update(s.copy(dups = s.dups + ids.size))
              Iterator.empty
            case None =>
              state.update(SeenState(ids.min, ids.size - 1L))
              Iterator.single(HashedDoc(hash, ids.min))
          }
        })
  }

  // ----------------------------------- incremental minhash-LSH dedup

  final case class BandSig(band: Int, sig: String, docId: Long)
  final case class DupOut(band: Int, docA: Long, docB: Long)
  final case class KeeperState(keeper: Long)

  /** Streaming/incremental MinHash-LSH dedup — the operational mode of
    * a 100 TB training-corpus pipeline (the corpus arrives continuously;
    * re-running batch LSH over all history per increment is quadratic
    * in wall-clock): each arriving document's LSH band signatures
    * (computed map-only upstream, [[graft.dedup.Dedup.bandSignatures]])
    * are checked against every EARLIER document, and a collision emits
    * `(band, keeper, doc)` in the batch it arrives.
    *
    * Keyed by `(band, sig)`, NOT by band alone: band-keyed state would
    * concentrate the whole corpus's signature map into nBands (= 16-32)
    * groups — a scale non-starter — while the composite key gives each
    * group ONE long of state (the keeper = first-seen docId), hashed
    * across every executor. NoTimeout is deliberate: a signature's
    * keeper IS the dedup memory and must survive the stream (same
    * contract as [[dedupStream]]).
    *
    * Replay contract: ascending docId across micro-batches (within a
    * batch, ids apply in ascending order), so the keeper is the global
    * minimum — exactly the batch oracle's
    * `min(doc_id) OVER (PARTITION BY band, sig)`.
    */
  def minhashDedupStream(spark: SparkSession,
                         rows: Dataset[BandSig]): Dataset[DupOut] = {
    import spark.implicits._
    rows.groupByKey(r => (r.band, r.sig))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Int, String), it: Iterator[BandSig],
         state: GroupState[KeeperState]) => {
          val ids = it.map(_.docId).toSeq.sorted
          val (keeper, dups) = state.getOption match {
            case Some(s) => (s.keeper, ids)
            case None =>
              state.update(KeeperState(ids.head))
              (ids.head, ids.tail)
          }
          dups.iterator.map(d => DupOut(key._1, keeper, d))
        })
  }

  // --------------------------------------- incremental bottom-k sample

  final case class KmvRow(shard: Int, h: Long, v: Long)
  final case class KmvState(hs: Array[Long], vs: Array[Long])

  /** Streaming twin of [[graft.sketch.Sketches.kmvQuantileSample]]:
    * the bottom-k hash sample maintained online. Sharded by `h % S`
    * so state distributes across executors (a single global group
    * would funnel every micro-batch through one task); each shard
    * keeps ITS k smallest `(h, v)` pairs — bottom-k is mergeable, so
    * bottom-k over the shard-state union equals the batch sample at
    * any point in the stream.
    *
    * Emission contract (what makes the sink replayable): a batch row
    * is emitted iff it survives the merge into its shard's bottom-k
    * (merge = multiset-union sorted, take k, previous state winning
    * ties). State only ever loses rows, so every row of the FINAL
    * bottom-k was emitted in its arrival batch — the sink is a
    * superset of the final sample whose own bottom-k IS the batch
    * answer, independent of arrival order and batch boundaries.
    * State per shard is ≤ k 16-byte pairs; NoTimeout, same rationale
    * as [[dedupStream]] (the sample IS the memory).
    */
  def kmvSampleStream(spark: SparkSession, rows: Dataset[KmvRow],
                      k: Int): Dataset[KmvRow] = {
    import spark.implicits._
    require(k >= 1, s"k=$k")
    rows.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (shard: Int, it: Iterator[KmvRow], state: GroupState[KmvState]) => {
          val prev = state.getOption
            .map(s => s.hs.zip(s.vs).toIndexedSeq)
            .getOrElse(IndexedSeq.empty)
          val batch = it.map(r => (r.h, r.v)).toIndexedSeq
          // stable sort: equal (h, v) pairs keep prev before batch, so
          // an already-admitted copy is never re-emitted by a tie
          val merged = (prev.map((_, false)) ++ batch.map((_, true)))
            .sortBy(_._1).take(k)
          state.update(KmvState(merged.map(_._1._1).toArray,
            merged.map(_._1._2).toArray))
          merged.iterator.collect { case ((h, v), true) => KmvRow(shard, h, v) }
        })
  }

  final case class GKmvRow(g: String, shard: Int, h: Long, v: Long)

  /** Grouped twin of [[kmvSampleStream]] — the incremental per-group
    * bottom-k behind [[graft.sketch.Sketches.kmvGroupedQuantiles]]:
    * state keys are `(group, h % S)`, so a hot group's sample
    * maintenance spreads over S shards instead of funneling one task,
    * and each shard holds ≤ k pairs. Same emission contract (batch rows
    * that survive their merge), so per group the sink is a superset of
    * the final sample and `kmvGroupedEstimate` over it equals the batch
    * answer for every group, order-independent.
    */
  def kmvGroupedSampleStream(spark: SparkSession, rows: Dataset[GKmvRow],
                             k: Int): Dataset[GKmvRow] = {
    import spark.implicits._
    require(k >= 1, s"k=$k")
    rows.groupByKey(r => (r.g, r.shard))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (String, Int), it: Iterator[GKmvRow],
         state: GroupState[KmvState]) => {
          val prev = state.getOption
            .map(s => s.hs.zip(s.vs).toIndexedSeq)
            .getOrElse(IndexedSeq.empty)
          val batch = it.map(r => (r.h, r.v)).toIndexedSeq
          val merged = (prev.map((_, false)) ++ batch.map((_, true)))
            .sortBy(_._1).take(k)
          state.update(KmvState(merged.map(_._1._1).toArray,
            merged.map(_._1._2).toArray))
          merged.iterator.collect { case ((h, v), true) =>
            GKmvRow(key._1, key._2, h, v) }
        })
  }

  /** Deterministic hash-priority order with keys computed ONCE per
    * element — `sortBy(md5Hex(...))` would re-run the digest on every
    * comparison (O(n log n) digests per group per micro-batch).
    */
  private def priorityOrder[T](xs: Iterator[T])(id: T => Long): Seq[T] =
    xs.toSeq.map(x => ((md5Hex(id(x)), id(x)), x)).sortBy(_._1).map(_._2)

  private def md5Hex(id: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
  }

  // ------------------------------------------- streaming curation gates

  final case class GroupedDoc(group: String, docId: Long, nTokens: Long)
  final case class QuotaState(admitted: Long)

  /** Streaming twin of [[graft.text.TextAnalysis.domainQuota]]: admit at
    * most `cap` documents per group (domain), first-arrival order.
    * State is one counter per group; idle groups evict after
    * `idleTimeoutMs` (a crawl frontier stops producing a domain, its
    * counter goes away — re-admission after eviction only ever ADMITS,
    * matching the batch operator's per-window semantics).
    */
  def quotaStream(spark: SparkSession, docs: Dataset[GroupedDoc], cap: Long,
                  idleTimeoutMs: Long = 300000): Dataset[GroupedDoc] = {
    import spark.implicits._
    docs.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (_: String, it: Iterator[GroupedDoc], state: GroupState[QuotaState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var n = state.getOption.map(_.admitted).getOrElse(0L)
            val out = scala.collection.mutable.ArrayBuffer[GroupedDoc]()
            priorityOrder(it)(_.docId).foreach { d =>
              if (n < cap) { out += d; n += 1 }
            }
            state.update(QuotaState(n))
            state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
        })
  }

  /** Streaming twin of [[graft.text.TextAnalysis.tokenBudgetMix]]: each
    * group's token budget fills as documents arrive; the doc that tips
    * the running total over the budget is the first one dropped. One
    * long of state per group — the cursor is the budget position and
    * must survive for the stream's life (NoTimeout: a group's spent
    * budget must not reset on idleness).
    */
  def budgetStream(spark: SparkSession, docs: Dataset[GroupedDoc],
                   budgetPerGroup: Long): Dataset[GroupedDoc] = {
    import spark.implicits._
    docs.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, it: Iterator[GroupedDoc], state: GroupState[PackState]) => {
          // mirror the batch operator exactly: the running total counts
          // EVERY arriving doc's tokens, and a doc survives iff the
          // total has not yet crossed the budget — once crossed, the
          // group is closed (no first-fit backfilling of smaller docs)
          var cum = state.getOption.map(_.nextTok).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer[GroupedDoc]()
          priorityOrder(it)(_.docId).foreach { d =>
            cum += d.nTokens
            if (cum <= budgetPerGroup) out += d
          }
          state.update(PackState(cum))
          out.iterator
        })
  }

  // -------------------------------------------------------- tail sampling

  final case class Span(traceId: String, spanId: String, tsSec: Long,
                        durationMs: Long, statusCode: Int, body: String)
  final case class TraceState(spans: List[Span], firstSeen: Long)

  /** Tail-sampling policy — the pluggable conditions of
    * processor_sampling (sampling_cond_*.c): keep a whole trace if ANY
    * condition matches (latency/status thresholds, span-count range,
    * span body attribute).
    */
  final case class TailPolicy(maxLatencyMs: Long = Long.MaxValue,
                              errorStatusMin: Int = 500,
                              keepErrorTraces: Boolean = true,
                              /** sampling_cond_span_count.c [min,max] */
                              spanCountRange: Option[(Int, Int)] = None,
                              /** string-attribute condition over body */
                              bodyMatches: Option[String => Boolean] = None) {
    def keep(spans: Seq[Span]): Boolean =
      spans.exists(_.durationMs >= maxLatencyMs) ||
        (keepErrorTraces && spans.exists(_.statusCode >= errorStatusMin)) ||
        spanCountRange.exists { case (lo, hi) =>
          spans.size >= lo && spans.size <= hi } ||
        bodyMatches.exists(f => spans.exists(s => f(s.body)))
  }

  /** processor_sampling tail mode (sampling.h:27-31): buffer whole traces
    * (span registry ≙ the group state), decide once the trace is quiet
    * for `decisionWaitMs`, emit all spans or none.
    */
  def tailSample(spark: SparkSession, spans: Dataset[Span], policy: TailPolicy,
                 decisionWaitMs: Long = 2000): Dataset[Span] = {
    import spark.implicits._
    spans.groupByKey(_.traceId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (_: String, it: Iterator[Span], state: GroupState[TraceState]) => {
          if (state.hasTimedOut) {
            val spansBuf = state.getOption.map(_.spans.reverse).getOrElse(Nil)
            state.remove()
            if (policy.keep(spansBuf)) spansBuf.iterator else Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(TraceState(Nil, 0))
            val all = it.foldLeft(prev.spans)((acc, s) => s :: acc)
            state.update(TraceState(all, prev.firstSeen))
            state.setTimeoutDuration(decisionWaitMs)
            Iterator.empty
          }
        })
  }

  // ------------------------------------------------------- counter rate

  final case class CounterSample(series: String, tsNs: Long, ord: Long,
                                 counter: Long)
  final case class RateOut(series: String, tsNs: Long, ord: Long,
                           increase: Long)
  final case class LastCounter(tsNs: Long, ord: Long, counter: Long)

  /** Streaming twin of [[graft.obs.Observability.counterRate]]: each
    * arriving counter sample emits its PromQL-style increase (reset ⇒
    * contribute the post-reset value, first sample of a series ⇒ 0)
    * against the last sample seen across ALL previous micro-batches.
    * State is one (ts, ord, counter) triple per series — bounded by
    * construction, so NoTimeout is safe (the last sample IS the rate
    * baseline and must survive; dropping it would re-zero the series).
    * Within a micro-batch, samples apply in (tsNs, ord) order, matching
    * the batch operator's window order, so batch and stream agree on
    * ordered input.
    */
  def rateStream(spark: SparkSession,
                 samples: Dataset[CounterSample]): Dataset[RateOut] = {
    import spark.implicits._
    samples.groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (series: String, it: Iterator[CounterSample],
         state: GroupState[LastCounter]) => {
          var prev = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[RateOut]()
          it.toSeq.sortBy(s => (s.tsNs, s.ord)).foreach { s =>
            val inc = prev match {
              case None => 0L
              case Some(p) =>
                if (s.counter < p.counter) s.counter else s.counter - p.counter
            }
            out += RateOut(series, s.tsNs, s.ord, inc)
            prev = Some(LastCounter(s.tsNs, s.ord, s.counter))
          }
          prev.foreach(state.update)
          out.iterator
        })
  }

  // --------------------------------------------------------------- cdc

  final case class Change(key: Long, seq: Long, op: String, payload: Long)
  final case class CdcRowState(seq: Long, op: String, payload: Long)

  /** Streaming twin of [[graft.ops.Cdc.merge]] — the continuously
    * materialized replica: per-key state holds the winning (seq, op,
    * payload) and a batch emits a key's row only when a HIGHER sequence
    * arrives (stale/out-of-order changes are absorbed silently; a
    * winning delete emits its tombstone so downstream sinks can erase).
    * State is one row per live key — the materialized view itself, the
    * irreducible minimum for CDC.
    */
  def cdcStream(spark: SparkSession,
                changes: Dataset[Change]): Dataset[Change] = {
    import spark.implicits._
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, it: Iterator[Change], state: GroupState[CdcRowState]) => {
          val best = it.maxBy(_.seq)
          val cur = state.getOption
          if (cur.forall(_.seq < best.seq)) {
            state.update(CdcRowState(best.seq, best.op, best.payload))
            Iterator.single(Change(key, best.seq, best.op, best.payload))
          } else Iterator.empty
        })
  }

  // ------------------------------------------------------------- burst

  final case class BucketCount(service: String, bucketUs: Long, n: Long)
  final case class BurstOut(service: String, bucketUs: Long, cnt: Long,
                            prevSum: Long, prevN: Long, isBurst: Boolean)
  final case class BurstState(buckets: List[(Long, Long)])

  /** Streaming twin of [[graft.obs.Observability.burst]]: per-service
    * state keeps the newest `lookback`+1 (bucket, count) cells — bounded
    * by construction — and every arriving pre-bucketed count merges in
    * IN BUCKET ORDER and immediately emits its bucket's evaluation
    * against the trailing cells known at that point (same integer
    * cross-multiply as the batch operator). Incremental evaluation —
    * rather than merge-whole-batch-then-evaluate — makes bulk replay
    * exact: fed each bucket once in order, every emission equals the
    * batch window's ROWS -lookback..-1 row, regardless of micro-batch
    * boundaries (the pre-r13 form silently dropped evaluations for
    * buckets older than the 13 newest within one large batch). A late
    * count for a bucket STRICTLY newer than the oldest retained cell
    * accumulates and re-evaluates against the then-current cells; a
    * late count at or below that floor is dropped — its own trailing
    * cells are already evicted, so evaluating it would score against a
    * truncated window (drop-not-fabricate, including the boundary).
    */
  def burstStream(spark: SparkSession, counts: Dataset[BucketCount],
                  num: Int = 3, den: Int = 1,
                  lookback: Int = 12): Dataset[BurstOut] = {
    import spark.implicits._
    counts.groupByKey(_.service)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (service: String, it: Iterator[BucketCount],
         state: GroupState[BurstState]) => {
          val cur = scala.collection.mutable.Map[Long, Long]()
          state.getOption.foreach(_.buckets.foreach { case (b, c) =>
            cur(b) = c })
          val out = scala.collection.mutable.ArrayBuffer[BurstOut]()
          it.toSeq.sortBy(_.bucketUs).foreach { bc =>
            // a count older than the retained window is DROPPED, not
            // evaluated: its true trailing cells (the batch ROWS
            // -lookback..-1 frame) were evicted, so any emission here
            // would score it against fabricated zeros
            val retainedFloor =
              if (cur.size <= lookback) Long.MinValue
              else cur.keys.toList.sorted.dropRight(lookback).last
            // STRICTLY newer than the oldest retained bucket: a late
            // count EQUAL to the floor bucket has its own trailing
            // cells already evicted, so evaluating it would score
            // against a truncated window — boundary late arrivals
            // follow the same drop-not-fabricate rule as older ones
            if (bc.bucketUs > retainedFloor) {
              cur(bc.bucketUs) = cur.getOrElse(bc.bucketUs, 0L) + bc.n
              // trailing = the newest `lookback` cells strictly older
              // than this bucket — the streaming ROWS -lookback..-1
              val trail = cur.toList.filter(_._1 < bc.bucketUs)
                .sortBy(-_._1).take(lookback)
              val prevSum = trail.map(_._2).sum
              val prevN = trail.size.toLong
              val cnt = cur(bc.bucketUs)
              out += BurstOut(service, bc.bucketUs, cnt, prevSum, prevN,
                prevN > 0 && cnt * prevN * den > prevSum * num)
              if (cur.size > lookback + 1) {
                val dead = cur.keys.toList.sorted
                  .dropRight(lookback + 1)
                dead.foreach(cur.remove)
              }
            }
          }
          state.update(BurstState(cur.toList))
          out.iterator
        })
  }

  // ------------------------------------------------------------ funnel

  final case class FunnelEvent(user: Long, tsNs: Long, stage: String)
  /** -1 = stage not reached; otherwise the stage's first qualifying ts. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long)
  final case class FunnelUpdate(user: Long, depth: Int,
                                step12Ns: Long, step23Ns: Long)

  /** Streaming twin of [[graft.obs.Observability.funnel]]: per-user
    * state is the three stage timestamps (the horizon state — 3 longs,
    * the irreducible funnel memory). Each arriving event advances the
    * user's ordered stage machine: stage 1 locks on its first
    * occurrence, stages 2/3 on their first occurrence strictly after
    * the previous stage within `horizonNs`. A depth advance emits a
    * FunnelUpdate (the user's LATEST update is its current funnel row;
    * per-depth rollups aggregate those downstream). In-order arrival
    * within a user is the contract — the same the batch operator's
    * conditional-min windows get from complete data; within a
    * micro-batch events are applied in ts order.
    */
  def funnelStream(spark: SparkSession, events: Dataset[FunnelEvent],
                   s1: String, s2: String, s3: String,
                   horizonNs: Long): Dataset[FunnelUpdate] = {
    import spark.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) => {
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          val out = scala.collection.mutable.ArrayBuffer[FunnelUpdate]()
          it.toSeq.sortBy(_.tsNs).foreach { e =>
            if (e.stage == s1 && st.t1 < 0) {
              st = st.copy(t1 = e.tsNs)
              out += FunnelUpdate(user, 1, 0L, 0L)
            } else if (e.stage == s2 && st.t1 >= 0 && st.t2 < 0 &&
                e.tsNs > st.t1 && e.tsNs <= st.t1 + horizonNs) {
              st = st.copy(t2 = e.tsNs)
              out += FunnelUpdate(user, 2, st.t2 - st.t1, 0L)
            } else if (e.stage == s3 && st.t2 >= 0 && st.t3 < 0 &&
                e.tsNs > st.t2 && e.tsNs <= st.t2 + horizonNs) {
              st = st.copy(t3 = e.tsNs)
              out += FunnelUpdate(user, 3, st.t2 - st.t1, st.t3 - st.t2)
            }
          }
          if (st.t1 >= 0) state.update(st)
          out.iterator
        })
  }

  // -------------------------------------------------------------- ewma

  final case class SeriesBucket(series: String, bucketUs: Long, cents: Long)
  final case class EwmaOut(series: String, bucketUs: Long, cents: Long,
                           ewmaFp: Long)
  final case class EwmaState(recent: List[(Long, Long)])

  final case class GapOut(series: String, bucketUs: Long, cents: Long,
                          nSamples: Long, filled: Long)
  final case class LastBucket(bucketUs: Long, cents: Long)

  /** Streaming twin of [[graft.obs.Timeseries.gapFillLocf]]: per-series
    * state is ONE (bucket, cents) cell; each arriving bucket first emits
    * the carried-forward gap rows since the last observed bucket, then
    * itself. The same in-order-within-series contract as the batch
    * window's ORDER BY.
    */
  def gapFillStream(spark: SparkSession, buckets: Dataset[SeriesBucket],
                    bucketUs: Long): Dataset[GapOut] = {
    import spark.implicits._
    buckets.groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (series: String, it: Iterator[SeriesBucket],
         state: GroupState[LastBucket]) => {
          var prev = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[GapOut]()
          it.toSeq.sortBy(_.bucketUs).foreach { b =>
            prev.foreach { p =>
              var g = p.bucketUs + bucketUs
              while (g < b.bucketUs) {
                out += GapOut(series, g, p.cents, 0L, 1L)
                g += bucketUs
              }
            }
            out += GapOut(series, b.bucketUs, b.cents, 1L, 0L)
            prev = Some(LastBucket(b.bucketUs, b.cents))
          }
          prev.foreach(state.update)
          out.iterator
        })
  }

  /** Streaming twin of [[graft.obs.Timeseries.ewma]]: per-series state
    * keeps the newest ≤16 (bucket, cents) cells — the exact window the
    * batch lag-chain sees — and each arriving bucket emits the identical
    * ×2^16 fixed-point sum. State is 16 longs per series, the
    * irreducible EWMA horizon; in-order arrival within a series is the
    * contract (the same one the batch window's ORDER BY provides).
    */
  def ewmaStream(spark: SparkSession,
                 buckets: Dataset[SeriesBucket]): Dataset[EwmaOut] = {
    import spark.implicits._
    buckets.groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (series: String, it: Iterator[SeriesBucket],
         state: GroupState[EwmaState]) => {
          var recent = state.getOption.map(_.recent).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer[EwmaOut]()
          it.toSeq.sortBy(_.bucketUs).foreach { b =>
            recent = ((b.bucketUs, b.cents) :: recent).take(16)
            val fp = recent.iterator.zipWithIndex
              .map { case ((_, c), k) => c * (1L << (15 - k)) }.sum
            out += EwmaOut(series, b.bucketUs, b.cents, fp)
          }
          state.update(EwmaState(recent))
          out.iterator
        })
  }

  // ------------------------------------------- sliding HLL (pane merge)

  final case class HllPaneRow(series: String, pane: Long, bucket: Int,
                              rank: Int)
  final case class HllCell(pane: Long, bucket: Int, rank: Int)
  final case class HllSlideState(cells: List[HllCell], maxPane: Long,
                                 lastFinal: Long)
  final case class HllWinOut(series: String, win: Long, nb: Long,
                             sScaled: Long, est: Long)

  /** Streaming twin of [[graft.sketch.Sketches.hllSlidingEstimate]] —
    * the continuous distinct-users dashboard: per-series state holds a
    * WINDOW-WIDTH RING of pane register sets (≤ (panes+1)·m cells, the
    * irreducible sketch state), arriving (pane, bucket, rank) cells
    * merge by register max (associative, commutative, idempotent — so
    * micro-batch boundaries can never change a register), and a
    * trailing window w = panes [w-(panes-1), w] finalizes the moment a
    * LATER pane arrives (the feed is pane-ordered; an event-time
    * watermark plays this role in production). A rank<0 sentinel row
    * flushes each series' remaining windows — the flush_ms convention
    * of the other replay twins. Estimator math is the integer-exact
    * p=8 formula shared with the batch oracle.
    */
  def hllSlidingStream(spark: SparkSession, rows: Dataset[HllPaneRow],
                       panes: Int = 3): Dataset[HllWinOut] = {
    import spark.implicits._
    val w1 = panes - 1
    rows.groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (series: String, it: Iterator[HllPaneRow],
         state: GroupState[HllSlideState]) => {
          val st = state.getOption
            .getOrElse(HllSlideState(Nil, Long.MinValue, Long.MinValue))
          val cells = scala.collection.mutable.Map[(Long, Int), Int]()
          st.cells.foreach(c => cells((c.pane, c.bucket)) = c.rank)
          var maxPane = st.maxPane
          var lastFinal = st.lastFinal
          val out = scala.collection.mutable.ArrayBuffer[HllWinOut]()
          def estimate(win: Long): HllWinOut = {
            val regs = scala.collection.mutable.Map[Int, Int]()
            cells.foreach { case ((p, b), r) =>
              if (p >= win - w1 && p <= win)
                regs(b) = math.max(regs.getOrElse(b, 0), r)
            }
            val nb = regs.size.toLong
            val sPresent = regs.valuesIterator.map(r => 1L << (25 - r)).sum
            val sScaled = sPresent + (256L - nb) * (1L << 25)
            val est = 71827L * ((256L * 256L * (1L << 25)) / sScaled) / 100000L
            HllWinOut(series, win, nb, sScaled, est)
          }
          def flushUpTo(wMax: Long): Unit = {
            // only windows that contain at least one pane exist
            val wins = cells.keysIterator.map(_._1).toSet.toSeq
              .flatMap((p: Long) => p to p + w1)
              .filter(w => w > lastFinal && w <= wMax).distinct.sorted
            wins.foreach(w => out += estimate(w))
            if (wMax > lastFinal) lastFinal = wMax
            // windows > wMax need panes >= wMax - (panes - 2)
            cells.filterInPlace { case ((p, _), _) => p >= wMax - w1 + 1 }
          }
          it.toSeq.sortBy(r => (r.pane, r.bucket, r.rank)).foreach { r =>
            if (r.rank < 0) {
              if (maxPane != Long.MinValue) flushUpTo(maxPane + w1)
            } else {
              if (r.pane > maxPane) {
                if (maxPane != Long.MinValue) flushUpTo(r.pane - 1)
                maxPane = r.pane
              }
              val k = (r.pane, r.bucket)
              cells(k) = math.max(cells.getOrElse(k, 0), r.rank)
            }
          }
          state.update(HllSlideState(
            cells.iterator.map { case ((p, b), r) => HllCell(p, b, r) }.toList,
            maxPane, lastFinal))
          out.iterator
        })
  }
}
