package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.operators.AsofJoin

/** Writes EXPLAINS.md: formatted physical plans for representative
  * queries, the evidence that the plans are the ones we want (pushed
  * filters, pruned schemas, broadcast joins, single-exchange windows).
  */
object Explains {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"

    val picks = Seq(
      "ev_time_slice" -> "P9 slice: ns-range filter pushed to the scan, columns pruned",
      "q1_pricing_summary" -> "A1-shape agg: partial (map-side) HashAggregate before the 4-group exchange; shipdate filter pushed",
      "q5_region_revenue" -> "dimension chain: region/nation/supplier broadcast, one shuffled join for orders x lineitem",
      "ev_asof_join" -> "J1 as-of: ONE exchange on user_id for the union+window plan",
      "ev_ohlcv_1h" -> "A1 OHLCV: pure hash aggregation (no window sort), min_by/max_by on the order key",
      "doc_ngram_jaccard" -> "prefix-filtered set-similarity join (persisted shingle frame: InMemoryTableScan reused across the prefix/sets branches)",
      "doc_dedup_exact" -> "exact dedup: the group-by exchange carries a 32-byte sha2 digest, not document bodies",
      "doc_simhash" -> "simhash: signature computed in a single typed map — NO Exchange between the scan and SerializeFromObject",
      "emb_lsh_dups" -> "LSH-fed near-dup: bucket self-join on bare ids, payload re-attach after dedup, exact cosine verify",
      "doc_tfidf_topk" -> "tf-idf: document frequency reads the persisted tf frame (InMemoryRelation) — one tokenization pass",
      "q17_small_qty" -> "correlated-subquery shape, written decorrelated: per-part aggregate joined back, then the global agg",
      "emb_lsh_topk" -> "ANN: ONE graft_srp projection per row computes all 24 tables' buckets; broadcast query buckets",
      "ev_asof_global" -> "J1-scale keyless as-of: the output is an ExistingRDD scan because the fill is the mapPartitions pass over the PERSISTED range exchange (repartitionByRange inside asofJoinRangePartitioned) — the point is what is ABSENT: no Window node, no single-partition Exchange, which is what `asofJoin(by=Nil)` would plan",
      "ev_tvi_24h" -> "A3 TVI via the JVM deque fold: one exchange on user_id + in-partition sort, then MapPartitions — no Window node",
      "ev_asof_salted" -> "J1 hot-key skew path: the fill window's Exchange hashpartitions on (user_id, __asof_bkt) — the salt splitting a hot key across time buckets — and the per-(key,bucket) carry frame joins back on the same keys",
      "doc_decontaminate" -> "decontamination: the benchmark shingle set is the BROADCAST side of the match — the corpus is never shuffled; only matched (doc, count) rows reach the final aggregation",
      "ev_catalog_scan" -> "K1/S3 catalog round trip: the scan shows block= and day= as PartitionFilters (directory pruning) and the exact ts bounds as PushedFilters (row-group stats) — the catalog's promise, visible in the plan",
      "doc_dedup_survivors" -> "output-linear survivors: the CC result (localCheckpointed RDD scan) LEFT-joins back to the corpus — output one row per doc regardless of pair growth",
      "bt_trades" -> "backtester trade log: one exchange on instrument + in-partition (ts, seq) sort + MapPartitions fold — the L2-book secondary-sort shape reused for portfolio state",
      "doc_para_dedup" -> "passage dedup: keeper election is ONE hash aggregation on the sha2 digest (partial_min_by map-side — losers never cross the wire), then a doc_id regroup for reconstruction — two narrow exchanges total",
      "doc_decontaminate_bloom" -> "bloom decontamination: the corpus side runs scan -> typed bloom filter -> join with NO exchange before the confirm join — the exact shingle set only ever meets bloom survivors",
      "emb_ivf_filtered_topk" -> "filtered IVF-ANN: the candidate BroadcastHashJoin keys on (list, label) — the predicate prunes before any cosine is computed; match columns ride the assignment map (no corpus self-join)",
      "doc_mixture_sample" -> "mixture resampling: weights fold into a literal CASE chain + md5-prefix filter + explode(sequence) directly over the scan — zero exchanges anywhere in the plan",
      "emb_semdedup_pairs" -> "SemDeDup: cluster assignment is a typed map over the scan (centroids broadcast — no exchange); the within-cluster self-join keys on lst (AQE broadcasts the tiny side at this SF; at scale it is one lst-keyed shuffle) — the n^2/k bound visible as the join key",
      "doc_lm_score" -> "LM scoring: the bigram frame is persisted (InMemoryTableScan x3 — one tokenization pass feeds both count aggs and the probability join); count aggs are partial/final pairs, vocabulary-sized",
      "doc_shuffle_shards" -> "shard shuffle: assignment is a literal CASE chain over md5 right after the scan (no exchange); the only exchange is the shard window's — the physical shard write's own partitioning",
      "doc_bm25_topk" -> "BM25: query terms are the BROADCAST side of the first join — only matching (doc, word) rows reach the per-(query, doc) aggregation; tf persisted (one tokenization feeds tf/dl/df); corpus stats ride a broadcast 1-row cross join",
      "doc_heavy_hitters_cms" -> "CMS twin: the sketch is ONE map-side-mergeable ObjectHashAggregate over the persisted word frame (fixed ~112 kB state); the exact top-k is a TakeOrderedAndProject (parallel partial top-k — the full vocab never crosses one window partition); the verdict map is a bounded-broadcast mapPartitions",
      "doc_substr_dups" -> "substring dup mass: anchors emit from one typed flatMap over the scan (no exchange); the digest group-by carries 64-byte sha2 keys (not window bodies twice); dup keys LEFT-join back and re-aggregate per doc — output-linear",
      "doc_bpe_encode" -> "BPE encode: after the train collect (bounded vocab metadata), the encode is a SINGLE map-only typed pass over the scan — no exchange anywhere downstream of the merge-table broadcast",
      "doc_token_budget" -> "token budget: NO global window — the quality histogram collapses to broadcast offsets, the corpus joins them and runs per-BUCKET windows (each partition one quality value); the oracle's single-partition running sum never appears in this plan",
      "doc_importance_weights" -> "importance weights: ONE tokenization feeds one vocab agg computing ccnt AND tcnt together (the target flag folds into the same aggregate — no second corpus pass); totals ride a broadcast 1-row agg of the vocab frame",
      "doc_dedup_incremental" -> "incremental dedup: the index side is a bare digest column; the batch joins it LEFT on digest + the keeper agg — three narrow digest-keyed operators, document bodies never shuffle",
      "doc_temperature_mixture" -> "temperature mixture: the group-count agg is the ONE action (metadata-sized collect feeding the weight rule); the sampled plan itself is the doc_mixture_sample shape — literal CASE chain + md5-prefix filter + explode(sequence) straight over the scan, zero exchanges",
      "doc_dedup_survivors_best" -> "quality-keeper survivors: the election is a component-keyed HashAggregate over (neg score, id) structs + one component re-join on top of the survivors CC shape — text never enters the election shuffle, output stays one row per doc",
      "doc_contamination_report" -> "contamination report: the per-suite benchmark shingle sets are the BROADCAST side; the corpus side has NO exchange before the (doc, suite) count agg, and the final suite-level agg is suite-cardinality-sized",
      "doc_source_cap" -> "domain capping: TWO window exchanges — phase 1 partitions on (source, id % salts) so a hot domain splits across salt buckets; phase 2's per-source window only ever sees <= cap*salts survivors per domain (the bounded partition is the point; a single-window plan would sort whole domains in one task)",
      "emb_quantized_topk" -> "SQ8 ANN: ONE graft_quantize projection per row (norm + codes in a single codegen'd pass — no CollapseProject re-inlining), quantized query codes broadcast, ranking by graft_idot on exact Longs — float arithmetic appears nowhere after the quantize",
      "doc_dedup_incremental_near" -> "incremental near-dup: new docs signed in ONE typed map; the index side appears ONLY in the (bidx, bhash) band join and the matched-signature re-join — never self-joined, never re-signed; verdict assembly is two left joins on bare ids",
      "doc_pipeline_ingest" -> "composed ingest curation: the exact-dedup stage shuffles 32-byte digests, its survivors feed the signature band join, and ONLY near-dup survivors reach the quality scoring + capped windows — each stage prunes the next stage's input, visible as the narrowing join chain",
      "doc_dedup_incremental_simhash" -> "simhash incremental: signatures RIDE the chunk-band rows (no signature re-join anywhere in the plan — compare the minhash variant's two re-joins); the index appears once, keyed (i_cidx, i_cval), verdict assembly is two left joins on bare ids",
      "doc_dedup_verdict_report" -> "dedup audit matrix: three verdict subplans share the ONE documents scan family, agree/disagree flags fold into a single 8-group hash aggregate — the audit costs the three verdicts, not a fourth corpus pass",
      "doc_corpus_drift" -> "corpus drift: ONE tokenization feeds one vocab agg computing BOTH snapshots' counts (the split flag folds into the same aggregate — no second corpus pass); totals ride a broadcast 1-row cross join; the report is a TakeOrderedAndProject on the integer drift key",
      "doc_dsir_select" -> "DSIR selection: the importance stage is the doc_importance_weights shape (one tokenization, one dual-count vocab agg, broadcast totals); the selection stage is the doc_token_budget shape (histogram collapses to broadcast offsets, per-bucket windows) — no global window anywhere",
      "doc_hybrid_rrf" -> "hybrid RRF: the lexical side is a typed flatMap over the scan with the query shingle sets BROADCAST (corpus text never shuffles; only matching candidates reach the per-query window); the dense side is the brute-force broadcast-query scan; fusion is one full-outer join on bare (q_id, doc_id) + integer arithmetic",
      "emb_pq_topk" -> "PQ-ADC ANN: encode is ONE typed map over the scan (codebook broadcast — m bytes/vector leave it, embeddings do not); scoring is a typed flatMap doing m table lookups per candidate (ADC tables broadcast); only (q_id, id, dist) integer rows reach the per-query top-k window",
      "emb_centroid_drift" -> "semantic drift: cluster assignment is a typed map with broadcast centroids (no exchange), the snapshot flag joins on bare vec_id, and counts fold into ONE k-row aggregate with broadcast totals — the report costs one corpus scan",
      "ev_anomaly_exact" -> "exact anomaly flags via the chunked deque fold: one exchange on (__chunk, event_type) + in-partition sort + MapPartitions — NO Window node (the declarative RANGE frame re-scans its 24h window per row: 18x slower, SCALE.md); the seed-row union is the 2x read amplification that buys keys x chunks parallelism",
      "doc_boilerplate_strip" -> "boilerplate strip: the df aggregation exchanges 40-byte (digest, doc_id) pairs (partial count-distinct map-side); the surviving digest set is the BROADCAST side of the flag join — passage bodies never shuffle for flagging; only surviving bodies reach the doc_id reconstruction exchange",
      "doc_model_quality" -> "model-based quality filter: the feature frame is ONE typed map over the scan (persisted — InMemoryTableScan feeds both the seed treeAggregate and the scoring pass); scoring is a codegen'd integer affine projection with the three learned micro-weights as literals — zero exchanges downstream of the fit",
      "doc_unigram_encode" -> "unigram encode: after the train collect (capped word-table metadata), the encode is a SINGLE mapPartitions pass with the (piece -> bitlen) table broadcast and a per-partition word memo — no exchange downstream of the vocabulary broadcast",
      "emb_context_pack" -> "in-context packing: cluster routing is a typed map with the coarse+fine centroids broadcast (the TWO-LEVEL path — the flat n*k assignment probed 18x/decade); token counts join on bare doc_id; the packer is one exchange on lst + in-partition (lst, doc_id) sort + MapPartitions fold",
      "emb_triplet_mining" -> "triplet mining: the positive arm is a broadcast HASH join on label (each corpus row scores only its own class); the negative arm filters label-inequality + the dup band INSIDE the scored scan before the per-anchor rank window; union of two narrow ranked frames",
      "doc_html_extract" -> "HTML extraction: the whole strip/decode/collapse chain is ONE codegen'd projection over the scan — regexp_replace and replace compose without any exchange; zero shuffle end to end",
      "doc_containment_pairs" -> "containment near-dup: one shingle explode + a df agg whose <= maxDf filter is BOTH the semantics (boilerplate is not quotation evidence) and the scale valve (join fanout <= maxDf per shingle); the self-join's (a,b) count agg is map-side combinable over bare long pairs — nothing wider than 24 bytes ever shuffles",
      "emb_pagerank" -> "kNN PageRank: three power-iteration rounds, each one edge-keyed join + one neighbor-keyed HashAggregate over bare (id, long) rows — the CC execution family; the kNN graph feeds it once via in-bucket scoring (no pair materialization), and the final rank is a RANGE-partitioned sort + zipWithIndex — no single-partition window anywhere (the plan below ends at the distributed sort; the rank map rides on its partitions)",
      "mm_phash_dups" -> "perceptual image near-dup: decode + dHash runs ONCE — the (doc_id, simhash) frame is persisted, so the band machinery's consumers are all InMemoryTableScans over one MapElements pass; at the hamming<=3 radius the 4 DISJOINT chunk-pair bands explode from the 64-bit hash in a codegen'd projection (1/7 the band rows of the C(8,2) set), pairs are popcount-verified INSIDE each capped bucket's collect_list group (the knnGraph shape — candidates never shuffled, sorted, or joined), and the rank-free cap guard adds NO window sort anywhere",
      "mm_keyframes" -> "keyframe detection: the WHOLE operator is one SerializeFromObject <- MapPartitions <- DeserializeToObject pipeline over the documents scan — a clip's frames arrive as one row, so decode, per-frame dHash, and the temporal lag all happen inside the typed flatMap with ZERO exchanges; the scan reads only doc_id (pruned ReadSchema)",
      "mm_video_dups" -> "video-level near-dup: keyframe extraction (decode + per-frame dHash + detection rule) is the mm_keyframes typed flatMap planned on a bare-id spread exchange (r13: the grading corpus is ONE scan partition, so the expensive decode map must take the session's parallelism, not the scan's — SCALE.md), emitting only ~3 (video, keyframe-hash) rows per clip; those ride the shared in-bucket band machinery (one exchange into capped collect_list groups), and the video-pair rollup is one hash aggregate over bare (a_vid, b_vid) longs — a clip's frames still never shuffle, the corpus scales by |scenes| not |frames|",
      "emb_knn_graph" -> "corpus kNN graph, in-bucket scoring: ONE exchange of (tbl, bkt, id, embedding) rows into an ObjectHashAggregate collect_list per capped bucket, pairwise cosines inside the bucket group (typed flatMap fold), then the map-side-combined per-src top-k aggregate — candidate pairs are never shuffled, sorted, distinct'd, or joined; the only pair-sized thing in the plan is an iterator",
      "mm_dedup_verdict_report" -> "cross-modal dedup verdict roll-up: three modality legs over ONE documents scan family, each a pruned doc_id-only scan -> bare-id spread exchange (the decode map takes the session's parallelism, not the single-file scan's) -> typed decode+hash map -> the shared in-bucket band machinery -> a per-doc tier fold (two min aggregates) -> left join on bare ids; the legs union AFTER folding, so nothing wider than (doc_id, two longs) crosses a leg's last exchange and the three decode maps never see each other's rows",
      "mm_phash_agreement" -> "dHash/DCT agreement: the SAME corpus decoded twice (two independent persisted hash frames — the two decode passes are the honest cost of hashing two ways), each feeding the shared banded in-bucket miner, then ONE full-outer SortMergeJoin on bare (a_id, b_id) pairs — output-sized inputs on both sides; no decode or hash work downstream of the two persisted frames",
      "mm_phash_incremental" -> "incremental perceptual dedup: ONE persisted decode+hash frame feeds both sides (InMemoryTableScans), the index enters the plan ONLY via the (cidx, cval) band join — signatures ride the band rows, no signature re-join anywhere — and verdict assembly is two left joins on bare ids; at production scale the index side is the band table stored bucketed on its join keys, so it never re-shuffles",
      "mm_phash_index_roundtrip" -> "the stored-index shape of the same verdict: the index enters the plan as a scan of the BucketedStore catalog table — at this tiny SF, AQE (correctly) broadcasts the band table, so the bucketing is invisible here; the property it buys — the index-side scan reporting the join's HashPartitioning so no index exchange is ever planned at scale — is pinned by BucketingSpec and measured at a 15M-doc index by tools/IncrementalScaleProbe (45.2 -> 16.3 s)",
      "mm_phash_agreement_blur" -> "the (F,T) agreement regime graded (r14): the blur corpus hashed both ways through the SAME persisted-frame + in-bucket-miner shape as mm_phash_agreement — since r15 from ONE dual-hash decode frame (doc_id, dh, ch): both miner legs are InMemoryTableScans over a single decode pass (decode-once-hash-twice; the codec pass dominates, the second 64-bit hash is noise), meeting in one full-outer SortMergeJoin on bare pair ids",
      "mm_phash_incremental_stream" -> "the ingest-time composition (r14): the displayed plan is the drain scan — the work happened in the streaming query it reads: arrivals decode+dHash in the stateless map, fMGWS band state answers 'earlier arrival within radius' (RocksDB-backed, sharded by band bucket), and each trigger's foreachBatch fold band-joins the micro-batch's (doc_id, sig) against the STORED BucketedStore index — the same hashIndexDupIds plan as the batch operator, so the index side never re-shuffles at scale; graded under the SAME shared SQL as mm_phash_incremental (the arrival engine changes no verdict)",
      "doc_nfc_normalize" -> "Unicode NFC as a native Expression: the whole query is ONE codegen'd projection over the scan — replace, graft_nfc, md5, lengths all in a single WholeStageCodegen span, zero exchanges after the spread; a UDF here would add a serialization boundary per row",
      "doc_accent_fold" -> "accent-insensitive dedup key: union of the corpus with its accent-injected copy, fold chain (graft_nfc -> graft_strip_accents -> md5) computed ONCE per row inside codegen, then a single key-partitioned Window (exchange + in-partition sort) answers keeper AND group size — no agg+self-join, the fold never re-evaluates",
      "mm_phash_index_maintenance" -> "the maintenance cycle: two verdict plans against ONE catalog table whose contents CHANGE between them — batch 1 reads the written index, its keepers append (one file per touched bucket, spec restated from the catalog), batch 2 reads the union; batch 1's half of the displayed union is an eager localCheckpoint scan (frozen BEFORE the append — re-executing it after would let keepers match themselves), batch 2's half is the live bucketed-scan join",
      "doc_case_fold" -> "case-insensitive dedup key (r15): the fold is graft_lower — per-codepoint SIMPLE lowercase as a codegen'd Expression (Spark's builtin lower takes String.toLowerCase's full default-LOCALE path on non-ASCII and emits TWO codepoints for dotted-capital-I, a nondeterministic dedup key across deployments); same one-window shape as doc_accent_fold — union, one codegen'd fold per row, ONE key-partitioned Window for keeper and group size",
      "mm_phash_maintenance_stream" -> "the streaming maintenance loop (r15): the displayed plan is the drain scan — per trigger the foreachBatch fold read the index table's CURRENT files via the same hashIndexDupIds plan as the batch operator, FROZE the verdict (eager localCheckpoint, the per-trigger read-your-own-writes discipline), then appended the trigger's keepers' band chunks so the NEXT trigger's dup_of_index covers them; trigger slicing pinned by one staged file per trigger (maxFilesPerTrigger=1, modTime order); apply compactBuckets on the maintenance cadence — appends grow file count and the fragmented-index scan cost with it (measured, SCALE.md r15)",
      "doc_canonical_key" -> "the full canonical dedup key (r15): nfc -> strip_accents -> lower composed as ONE codegen'd projection per row (three UnaryExpressions nest inside a single WholeStageCodegen span — no UDF boundary between passes), four corpus legs unioned, then the one key-partitioned Window; the absorb property (n_dups = 4 for every group) is the output-level proof each pass reproduced exact bytes",
      "mm_phash_maintenance_compacted" -> "maintenance + compaction (r15): identical verdict plans to mm_phash_index_maintenance — the compactBuckets rewrite between append and batch 2 is INVISIBLE here by design (same rows, same bucket spec, catalog repointed to one file per bucket); the displayed batch-2 scan reads the compacted files, and the shared oracle SQL proves the rewrite changed nothing",
      "mm_phash_agreement_blur_lossy" -> "blur across the lossy boundary (r15): ONE dual-hash decode frame (real JPEG decode of the unedited twin, blur + real PNG round-trip of the edited twin — decode-once-hash-twice measured 17.2 -> 8.6 s at sf1eq 10x vs the two-frame draft) feeding both in-bucket miner legs + the full-outer agreement join; the finding is in the OUTPUT census: on block-constant content the DCT's 32x32 sample comb sits exactly on the block-edge pixels a horizontal blur mixes, so (T,F) dominates 108:29 — blur-robustness is a content-class property, not a hash property")

    val sb = new StringBuilder
    sb.append("# EXPLAINS — representative physical plans\n\n")
    sb.append("Generated by `sbt \"runMain graft.Explains\"` at sf0.001.\n")
    picks.foreach { case (name, note) =>
      sb.append(s"\n## $name\n\n$note\n\n```\n")
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      sb.append(plan.linesIterator.take(80).mkString("\n"))
      sb.append("\n```\n")
    }

    // the global as-of scale path (library API, not a named query)
    import spark.implicits._
    val l = (0 until 100).map(i => (i * 7L % 500, i.toLong)).toDF("ts_us", "lid")
    val r = (0 until 60).map(i => (i * 13L % 500, i * 1.0)).toDF("ts_us", "rv")
    val g = AsofJoin.asofJoinRangePartitioned(l, r, "ts_us", "r", 8)
    sb.append("\n## asofJoinRangePartitioned (global as-of scale path)\n\n")
    sb.append(s"rows=${g.count()} — range partition + carry, no global window.\n")

    Files.writeString(Paths.get("/root/repo/EXPLAINS.md"), sb.toString)
    println("wrote EXPLAINS.md")
    spark.stop()
  }
}
