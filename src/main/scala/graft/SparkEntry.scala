package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _),
    "q3_join_topk" -> (Relational.q3JoinTopk _),
    "q5_star_join" -> (Relational.q5StarJoin _),
    "q_window_rank" -> (Relational.qWindowRank _),
    "q_scalar_filter" -> (Relational.qScalarFilter _),
    "q_count_distinct" -> (Relational.qCountDistinct _),
    "q_topk_orders" -> (Relational.qTopkOrders _),
    "cdc_state_snapshot" -> (graft.cdc.Cdc.stateSnapshot _),
    "cdc_latest_upsert" -> (graft.cdc.Cdc.latestUpsert _),
    "cdc_replica_diff" -> (graft.cdc.Cdc.replicaDiff _),
    "cdc_msg_count" -> (graft.cdc.Cdc.msgCount _),
    "cdc_channel_watermark" -> (graft.cdc.Cdc.channelWatermark _),
    "cdc_barrier_ts" -> (graft.cdc.Cdc.barrierTs _),
    "cdc_ordering_audit" -> (graft.cdc.Cdc.orderingAudit _),
    "cdc_replay_dedup" -> (graft.cdc.Cdc.replayDedup _),
    "cdc_tail_lag" -> (graft.cdc.Cdc.tailLag _),
    "text_token_count" -> (Text.tokenCount _),
    "text_quality" -> (Text.quality _),
    "text_langid" -> (Text.langid _),
    "text_fingerprint" -> (Text.fingerprint _),
    "dedup_exact" -> (Dedup.exact _),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "vec_knn_bruteforce" -> ((s, d) => Similarity.knnBruteforce(s, d)),
    "vec_filtered_knn" -> ((s, d) => Similarity.filteredKnn(s, d)),
    "vec_knn_join" -> ((s, d) => Similarity.knnJoin(s, d)),
    "vec_range_search" -> ((s, d) => Similarity.rangeSearch(s, d)),
    "vec_ivf_search" -> ((s, d) => Similarity.ivfSearch(s, d)),
    "vec_ivf_join" -> ((s, d) => Similarity.ivfJoin(s, d)),
    "vec_normalize" -> (Similarity.normalize _),
    "vec_pairwise_dups" -> ((s, d) => Similarity.pairwiseDups(s, d)),
    "stream_cdc_state" -> (graft.streaming.CdcStream.cdcState _),
    "stream_window_counts" -> (graft.streaming.CdcStream.windowCounts _),
    "mm_decode_meta" -> (Multimodal.decodeMeta _),
    "mm_feature_batch" -> ((s, d) => Multimodal.featureBatch(s, d)),
    "mm_frame_sample" -> ((s, d) => Multimodal.frameSample(s, d)),
    "mm_resize" -> ((s, d) => Multimodal.resize(s, d)),
    "cdc_seek_asof" -> ((s, d) => graft.cdc.Cdc.seekAsof(s, d)),
    "q_approx_distinct" -> ((s, d) => Sketch.approxDistinct(s, d)),
    "q_value_quantiles" -> ((s, d) => Sketch.valueQuantiles(s, d)),
    "cdc_tso_convert" -> (graft.cdc.Cdc.tsoConvert _),
    "cdc_apply_changes" -> (graft.cdc.Cdc.applyChanges _),
    "stream_append_windows" -> (graft.streaming.CdcStream.appendWindows _),
    "stream_replay_dedup" -> (graft.streaming.CdcStream.replayDedup _),
    "text_ngram_freq" -> ((s, d) => Text.ngramFreq(s, d)),
    "vec_label_centroids" -> (Similarity.labelCentroids _),
    "vec_dim_stats" -> (Similarity.dimStats _),
    "q_hll_merge" -> ((s, d) => Sketch.hllMerge(s, d)),
    "q_json_field" -> (Relational.qJsonField _),
    "vec_l2_knn" -> ((s, d) => Similarity.l2Knn(s, d)),
    "vec_ip_knn" -> ((s, d) => Similarity.ipKnn(s, d)),
    "vec_binary_knn" -> ((s, d) => Similarity.binaryKnn(s, d)),
    "vec_grouped_knn" -> ((s, d) => Similarity.groupedKnn(s, d)),
    "vec_hybrid_rrf" -> ((s, d) => Similarity.hybridRrf(s, d)),
    "cdc_ttl_expiry" -> ((s, d) => graft.cdc.Cdc.ttlExpiry(s, d)),
    "cdc_segment_stats" -> (graft.cdc.Cdc.segmentStats _),
    "q_sessionize" -> ((s, d) => Relational.qSessionize(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.clusters(s, d)),
    "q_pivot" -> (Relational.qPivot _),
    "q_rollup" -> (Relational.qRollup _),
    "q_point_get" -> ((s, d) => Similarity.pointGet(s, d)),
    "stream_vec_search" -> ((s, d) => graft.streaming.CdcStream.vecSearch(s, d)),
    "vec_lsh_search" -> ((s, d) => Similarity.lshSearch(s, d)),
    "cdc_ddl_apply" -> (graft.cdc.Cdc.ddlApply _),
    "cdc_task_state" -> (graft.cdc.Cdc.taskState _),
    "cdc_collection_watermark" -> (graft.cdc.Cdc.collectionWatermark _),
    "cdc_kafka_format" -> (graft.cdc.Cdc.kafkaFormat _),
    "cdc_position_log" -> (graft.cdc.Cdc.positionLog _),
    "cdc_op_messages" -> (graft.cdc.Cdc.opMessages _),
    "cdc_rbac_state" -> (graft.cdc.Cdc.rbacState _),
    "cdc_name_mapping" -> (graft.cdc.Cdc.nameMapping _),
    "cdc_position_codec" -> (graft.cdc.Cdc.positionCodec _),
    "stream_task_state" -> (graft.streaming.CdcStream.taskState _),
    "stream_kafka_format" -> (graft.streaming.CdcStream.kafkaFormat _),
    "stream_collection_watermark" -> (graft.streaming.CdcStream.collectionWatermark _),
    "pipeline_clean_corpus" -> ((s, d) => Pipeline.cleanCorpus(s, d)),
    "text_winnow_fingerprint" -> ((s, d) => Text.winnowFingerprint(s, d)),
    "text_contamination" -> ((s, d) => Text.contamination(s, d)),
    "cdc_msgpack_batch" -> ((s, d) => graft.cdc.Cdc.msgpackBatch(s, d)),
    "cdc_task_metrics" -> (graft.cdc.Cdc.taskMetrics _),
    "stream_msgpack_batch" -> ((s, d) => graft.streaming.CdcStream.msgpackBatch(s, d)),
    "cdc_channel_mapping" -> (graft.cdc.Cdc.channelMapping _),
    "text_repetition" -> (Text.repetition _),
    "q_stratified_sample" -> (Relational.qStratifiedSample _),
    "dedup_semantic" -> ((s, d) => Similarity.semanticDedup(s, d)),
    "pipeline_pack_sequences" -> ((s, d) => Pipeline.packSequences(s, d)),
    "text_rarity_score" -> (Text.rarityScore _),
    "vec_kmeans_refine" -> ((s, d) => Similarity.kmeansRefine(s, d)),
    "vec_scalar_quantize" -> (Similarity.scalarQuantize _),
  )

  /** DuckDB-equivalent SQL per query; same column aliases as the Spark side
    * (the driver sorts columns by name before hashing).
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join_topk" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_star_join" ->
      """SELECT n_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_window_rank" ->
      """SELECT o_orderkey, o_orderpriority, round(o_totalprice, 4) AS o_totalprice, rk FROM (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) t
        |WHERE rk <= 3""".stripMargin,
    "q_scalar_filter" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_count_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS users,
        |  count(*) AS cnt,
        |  round(sum(value), 4) AS total_value
        |FROM events
        |GROUP BY event_type""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin,
    "cdc_state_snapshot" ->
      """SELECT * FROM (
        |  SELECT user_id, CAST(user_id % 4 AS BIGINT) AS channel,
        |    CAST(max(ts) FILTER (WHERE event_type <> 'error') AS TIMESTAMP) AS last_upsert_ts,
        |    CAST(max(ts) FILTER (WHERE event_type = 'error') AS TIMESTAMP) AS last_delete_ts,
        |    count(*) FILTER (WHERE event_type <> 'error') AS upserts,
        |    count(*) FILTER (WHERE event_type = 'error') AS deletes
        |  FROM events GROUP BY user_id) t
        |WHERE last_upsert_ts IS NOT NULL
        |  AND (last_delete_ts IS NULL OR last_upsert_ts >= last_delete_ts)""".stripMargin,
    "cdc_latest_upsert" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |  round(value, 4) AS last_value, CAST(ts AS TIMESTAMP) AS last_ts
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type <> 'error') t
        |WHERE rn = 1""".stripMargin,
    "cdc_replica_diff" ->
      """WITH folda AS (
        |  SELECT user_id,
        |    max(ts) FILTER (WHERE event_type <> 'error') AS u,
        |    max(ts) FILTER (WHERE event_type = 'error') AS d
        |  FROM events GROUP BY user_id),
        |foldb AS (
        |  SELECT user_id,
        |    max(ts) FILTER (WHERE event_type <> 'error') AS u,
        |    max(ts) FILTER (WHERE event_type = 'error') AS d
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-20' GROUP BY user_id),
        |j AS (
        |  SELECT coalesce(a.user_id, b.user_id) AS user_id,
        |    coalesce(a.u IS NOT NULL AND (a.d IS NULL OR a.u >= a.d), FALSE) AS alive_a,
        |    coalesce(b.u IS NOT NULL AND (b.d IS NULL OR b.u >= b.d), FALSE) AS alive_b
        |  FROM folda a FULL OUTER JOIN foldb b ON a.user_id = b.user_id)
        |SELECT user_id, alive_a, alive_b,
        |  CASE WHEN alive_a AND NOT alive_b THEN 'a_only'
        |       WHEN NOT alive_a AND alive_b THEN 'b_only'
        |       WHEN alive_a AND alive_b THEN 'both_alive'
        |       ELSE 'both_dead' END AS diff_class
        |FROM j WHERE NOT (alive_a AND alive_b)""".stripMargin,
    "cdc_msg_count" ->
      """SELECT CAST(user_id % 4 AS BIGINT) AS channel, count(*) AS msgs,
        |  CAST(min(ts) AS TIMESTAMP) AS first_ts, CAST(max(ts) AS TIMESTAMP) AS last_ts
        |FROM events WHERE ts > TIMESTAMP '2024-01-20'
        |GROUP BY 1""".stripMargin,
    "cdc_channel_watermark" ->
      """SELECT channel, channel_max_ts, channel_cnt,
        |  min(channel_max_ts) OVER () AS global_watermark
        |FROM (
        |  SELECT CAST(user_id % 4 AS BIGINT) AS channel,
        |    CAST(max(ts) AS TIMESTAMP) AS channel_max_ts, count(*) AS channel_cnt
        |  FROM events GROUP BY 1) t""".stripMargin,
    // crossings restated as the LINEAR forward union-as-of (probes sort
    // before events at equal ts, min event-ts over the following frame =
    // first event at-or-after the DDL) — the inequality-join form is
    // quadratic in DuckDB exactly as in Spark and burned 8+ CPU-hours at
    // the 100M-event corpus; same restatement seek_asof got in round 6.
    "cdc_barrier_ts" ->
      """WITH ddls AS MATERIALIZED (
        |  SELECT event_id AS ddl_id, ts AS ddl_ts FROM events
        |  WHERE event_type = 'signup' AND event_id % 500 = 0),
        |q AS (SELECT ddl_id, ddl_ts, channel
        |      FROM ddls, unnest(generate_series(0, 3)) AS c(channel)),
        |e AS (SELECT CAST(user_id % 4 AS BIGINT) AS channel, ts FROM events),
        |u AS (
        |  SELECT channel, ts, 0 AS is_probe, ts AS ev_ts, NULL::BIGINT AS ddl_id FROM e
        |  UNION ALL
        |  SELECT channel, ddl_ts AS ts, 1 AS is_probe, NULL AS ev_ts, ddl_id FROM q),
        |r AS (
        |  SELECT channel, is_probe, ddl_id,
        |    min(ev_ts) OVER (PARTITION BY channel ORDER BY ts, is_probe DESC
        |                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS first_crossing
        |  FROM u),
        |crossings AS (
        |  SELECT ddl_id, channel, first_crossing
        |  FROM r WHERE is_probe = 1 AND first_crossing IS NOT NULL)
        |SELECT c.ddl_id, CAST(d.ddl_ts AS TIMESTAMP) AS ddl_ts,
        |  CAST(max(c.first_crossing) AS TIMESTAMP) AS barrier_ts
        |FROM crossings c JOIN ddls d ON c.ddl_id = d.ddl_id
        |GROUP BY c.ddl_id, d.ddl_ts HAVING count(*) = 4""".stripMargin,
    "cdc_ordering_audit" ->
      """SELECT channel, count(*) FILTER (WHERE ts < prev_max) AS out_of_order,
        |  count(*) AS total
        |FROM (
        |  SELECT CAST(user_id % 4 AS BIGINT) AS channel, ts,
        |    max(ts) OVER (PARTITION BY user_id % 4 ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM events) t
        |GROUP BY channel""".stripMargin,
    "cdc_replay_dedup" ->
      """WITH ev AS (SELECT CAST(user_id % 4 AS BIGINT) AS channel, event_id, ts FROM events),
        |rep AS (SELECT * FROM ev
        |        UNION ALL SELECT * FROM ev WHERE ts > TIMESTAMP '2024-01-20')
        |SELECT channel, count(*) AS raw_cnt, count(DISTINCT event_id) AS dedup_cnt
        |FROM rep GROUP BY channel""".stripMargin,
    "cdc_tail_lag" ->
      """SELECT channel, checkpoint_ts, head_ts, pending,
        |  epoch_ms(head_ts) - epoch_ms(checkpoint_ts) AS lag_ms
        |FROM (
        |  SELECT CAST(user_id % 4 AS BIGINT) AS channel,
        |    CAST(max(ts) FILTER (WHERE ts <= TIMESTAMP '2024-01-20') AS TIMESTAMP) AS checkpoint_ts,
        |    CAST(max(ts) AS TIMESTAMP) AS head_ts,
        |    count(*) FILTER (WHERE ts > TIMESTAMP '2024-01-20') AS pending
        |  FROM events GROUP BY 1) t""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS BIGINT) AS re_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_m
        |FROM documents""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_m,
        |  CAST(len(tk) AS BIGINT) AS n_tokens,
        |  round(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 4) AS uniq_ratio,
        |  round(CAST(len(list_filter(tk, x -> x IN ('the','a','and','of','is'))) AS DOUBLE) / len(tk), 4) AS stop_ratio,
        |  round(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio,
        |  round(0.4 * (CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk))
        |      + 0.4 * (1.0 - CAST(len(list_filter(tk, x -> x IN ('the','a','and','of','is'))) AS DOUBLE) / len(tk))
        |      + 0.2 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) / length(text)), 4) AS score
        |FROM t""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id, lang,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, lang,
        |    CAST(len(list_filter(tk, x -> x IN ('the','a','and','of','is'))) AS BIGINT) AS s_en,
        |    len(list_filter(tk, x -> x IN ('der','die','und','das','ist'))) AS s_de,
        |    len(list_filter(tk, x -> x IN ('el','los','las','y','es'))) AS s_es,
        |    len(list_filter(tk, x -> x IN ('le','la','et','les','des'))) AS s_fr,
        |    len(list_filter(tk, x -> x IN ('de','shi','le','bu','wo'))) AS s_zh
        |  FROM t),
        |g AS (SELECT *, greatest(s_en, s_de, s_es, s_fr, s_zh) AS mx,
        |    CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'und'
        |         WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
        |         WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
        |         WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
        |         WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
        |         ELSE 'zh' END AS guess
        |  FROM s)
        |SELECT doc_id, lang AS label_lang, guess, guess = lang AS is_match, s_en
        |FROM g""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  CAST(length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS BIGINT) AS n_norm_chars
        |FROM documents""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        |  min(doc_id) AS canonical_id, count(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,
    // Gram identity is hash()-ed to 64 bits in the four pair-join oracles
    // (same argument as the Spark side's xxhash64 shingles: set semantics
    // preserved up to ~n^2/2^64 collisions), and the grams CTE is
    // MATERIALIZED — without the hint DuckDB re-inlines the triple-
    // referenced CTE into a plan that measured 35x slower at the 10x set
    // (1601 s -> 45 s for this oracle).
    "dedup_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
        |grams AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, hash(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS gram
        |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
        |  WHERE len(t) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS s
        |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(CAST(s AS DOUBLE) / (ca.n + cb.n - s), 4) AS jaccard
        |FROM shared JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |WHERE round(CAST(s AS DOUBLE) / (ca.n + cb.n - s), 4) >= 0.5""".stripMargin,
    // LSH candidates are verified with EXACT Jaccard inside the operator,
    // so its output equals the exact tau=0.5 pair set whenever banding
    // recall is 1 — deterministic for fixed data and seeds, and measured
    // missed=0 / extra=0 at every SF (tools/CheckLshRecall). The oracle is
    // therefore the same exact-join SQL as dedup_ngram_jaccard at tau=0.5.
    "dedup_minhash_lsh" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
        |grams AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, hash(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS gram
        |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
        |  WHERE len(t) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS s
        |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(CAST(s AS DOUBLE) / (ca.n + cb.n - s), 4) AS jaccard
        |FROM shared JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |WHERE round(CAST(s AS DOUBLE) / (ca.n + cb.n - s), 4) >= 0.5""".stripMargin,
    "vec_knn_bruteforce" ->
      """WITH n AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(list_sum(list_transform(list_zip(n.embedding, qe),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * qn), 4) AS cos
        |FROM n, q WHERE vec_id <> 0
        |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin,
    "vec_filtered_knn" ->
      """WITH n AS (SELECT vec_id, label, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  round(list_sum(list_transform(list_zip(n.embedding, qe),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * qn), 4) AS cos
        |FROM n, q WHERE vec_id <> 0 AND label IN (1, 3, 5)
        |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin,
    "vec_knn_join" ->
      """WITH n AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS qe, nrm AS qn FROM n WHERE vec_id < 8),
        |s AS (SELECT q_id, n.vec_id,
        |    round(list_sum(list_transform(list_zip(n.embedding, qe),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * qn), 4) AS cos
        |  FROM n, q WHERE n.vec_id >= 8),
        |r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk FROM s)
        |SELECT q_id, vec_id, cos, rk FROM r WHERE rk <= 3""".stripMargin,
    "vec_range_search" ->
      """WITH n AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(list_sum(list_transform(list_zip(n.embedding, qe),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * qn), 4) AS cos
        |FROM n, q WHERE vec_id <> 0
        |  AND round(list_sum(list_transform(list_zip(n.embedding, qe),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * qn), 4) >= 0.25""".stripMargin,
    "vec_normalize" ->
      """WITH n AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings)
        |SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  round(nrm, 4) AS l2_norm,
        |  round(CAST(embedding[1] AS DOUBLE) / nrm, 4) AS head_norm
        |FROM n""".stripMargin,
    "vec_pairwise_dups" ->
      """WITH n AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (a.nrm * b.nrm), 4) AS cos
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (a.nrm * b.nrm), 4) >= 0.45""".stripMargin,
    // Streaming scoring ≡ the batch knn join — shares its oracle shape.
    "stream_vec_search" ->
      """WITH n AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS qe, nrm AS qn FROM n WHERE vec_id < 8),
        |s AS (SELECT q_id, n.vec_id,
        |    round(list_sum(list_transform(list_zip(n.embedding, qe),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * qn), 4) AS cos
        |  FROM n, q WHERE n.vec_id >= 8),
        |r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk FROM s)
        |SELECT q_id, vec_id, cos, rk FROM r WHERE rk <= 3""".stripMargin,
    // Streaming fold ≡ batch fold — shares the batch snapshot's oracle.
    "stream_cdc_state" ->
      """SELECT * FROM (
        |  SELECT user_id, CAST(user_id % 4 AS BIGINT) AS channel,
        |    CAST(max(ts) FILTER (WHERE event_type <> 'error') AS TIMESTAMP) AS last_upsert_ts,
        |    CAST(max(ts) FILTER (WHERE event_type = 'error') AS TIMESTAMP) AS last_delete_ts,
        |    count(*) FILTER (WHERE event_type <> 'error') AS upserts,
        |    count(*) FILTER (WHERE event_type = 'error') AS deletes
        |  FROM events GROUP BY user_id) t
        |WHERE last_upsert_ts IS NOT NULL
        |  AND (last_delete_ts IS NULL OR last_upsert_ts >= last_delete_ts)""".stripMargin,
    "stream_window_counts" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
        |  CAST(date_trunc('day', ts) + INTERVAL 1 DAY AS TIMESTAMP) AS window_end,
        |  event_type, count(*) AS cnt
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "mm_decode_meta" ->
      """SELECT doc_id, source, CAST(length(text) AS BIGINT) AS byte_len,
        |  md5(text) AS content_md5,
        |  CAST(64 + (CAST(length(text) AS BIGINT) * 2654435761) % 960 AS BIGINT) AS width,
        |  CAST(64 + (CAST(length(text) AS BIGINT) * 40503) % 704 AS BIGINT) AS height,
        |  CAST((length(text) - 1) // 256 + 1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    "mm_feature_batch" ->
      """WITH ch AS (
        |  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
        |  FROM documents, unnest(generate_series(1, length(text))) AS u(i)),
        |e AS (SELECT doc_id, round(entropy(c), 4) AS entropy FROM ch GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST(list_sum(list_transform(range(1, CAST(length(text) AS INT) + 1),
        |    i -> ord(substr(text, i, 1)))) AS BIGINT) AS byte_sum,
        |  CAST(len(list_distinct(list_transform(range(1, CAST(length(text) AS INT) + 1),
        |    i -> substr(text, i, 1)))) AS BIGINT) AS distinct_bytes,
        |  round(CAST(list_sum(list_transform(range(1, CAST(length(text) AS INT) + 1),
        |    i -> ord(substr(text, i, 1)))) AS DOUBLE) / length(text), 4) AS mean_byte,
        |  e.entropy
        |FROM documents d JOIN e ON d.doc_id = e.doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  CAST(i * 256 AS BIGINT) AS byte_offset,
        |  md5(substr(text, CAST(i * 256 + 1 AS INT), 64)) AS frame_md5,
        |  CAST(length(substr(text, CAST(i * 256 + 1 AS INT), 64)) AS BIGINT) AS frame_bytes
        |FROM documents, unnest(generate_series(0, (length(text) - 1) // 256)) AS u(i)""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id, CAST(32 AS BIGINT) AS target_size,
        |  array_to_string(list_transform(range(0, 32),
        |    i -> substr(text, CAST(floor(i * length(text) / 32) AS INT) + 1, 1)), '') AS signature,
        |  md5(array_to_string(list_transform(range(0, 32),
        |    i -> substr(text, CAST(floor(i * length(text) / 32) AS INT) + 1, 1)), '')) AS sig_md5
        |FROM documents""".stripMargin,
    // Linear union-as-of, the same shape as the Spark operator: probes sort
    // AFTER events at equal ts (at-or-before includes ties), and each probe
    // reads the running lexicographic max of (ts, event_id). The previous
    // inequality-join formulation was quadratic on the ORACLE side — 436 s
    // at the 10x set vs ~2 s for this one, same answer.
    "cdc_seek_asof" ->
      """WITH ddls AS (
        |  SELECT event_id AS ddl_id, ts AS ddl_ts FROM events
        |  WHERE event_type = 'signup' AND event_id % 500 = 0),
        |q AS (SELECT ddl_id, ddl_ts, channel
        |      FROM ddls, unnest(generate_series(0, 3)) AS c(channel)),
        |e AS (SELECT CAST(user_id % 4 AS BIGINT) AS channel, ts, event_id FROM events),
        |u AS (
        |  SELECT channel, ts, 0 AS is_probe, event_id, NULL::BIGINT AS ddl_id FROM e
        |  UNION ALL
        |  SELECT channel, ddl_ts AS ts, 1 AS is_probe, NULL::BIGINT AS event_id, ddl_id FROM q),
        |r AS (
        |  SELECT channel, is_probe, ddl_id,
        |    max(CASE WHEN is_probe = 0 THEN ROW(ts, event_id) END)
        |      OVER (PARTITION BY channel
        |            ORDER BY ts, is_probe, coalesce(event_id, 9223372036854775807)
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |  FROM u)
        |SELECT ddl_id, channel, CAST(p[1] AS TIMESTAMP) AS pos_ts, p[2] AS pos_event_id
        |FROM r WHERE is_probe = 1 AND p IS NOT NULL""".stripMargin,
    "cdc_tso_convert" ->
      """WITH t AS (
        |  SELECT event_id,
        |    (epoch_ms(CAST(ts AS TIMESTAMP)) << 18) + (event_id % 262144) AS tso
        |  FROM events)
        |SELECT event_id, tso,
        |  tso >> 18 AS phys_ms,
        |  tso & 262143 AS logical,
        |  epoch_ms(tso >> 18) AS phys_ts
        |FROM t""".stripMargin,
    "cdc_apply_changes" ->
      """SELECT * FROM (
        |  SELECT user_id, CAST(user_id % 4 AS BIGINT) AS channel,
        |    CAST(max(ts) FILTER (WHERE event_type <> 'error') AS TIMESTAMP) AS last_upsert_ts,
        |    CAST(max(ts) FILTER (WHERE event_type = 'error') AS TIMESTAMP) AS last_delete_ts,
        |    count(*) FILTER (WHERE event_type <> 'error') AS upserts,
        |    count(*) FILTER (WHERE event_type = 'error') AS deletes
        |  FROM events GROUP BY user_id) t
        |WHERE last_upsert_ts IS NOT NULL
        |  AND (last_delete_ts IS NULL OR last_upsert_ts >= last_delete_ts)""".stripMargin,
    "stream_append_windows" ->
      """WITH w AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
        |    CAST(date_trunc('day', ts) + INTERVAL 1 DAY AS TIMESTAMP) AS window_end,
        |    event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2, 3),
        |m AS (SELECT CAST(max(ts) AS TIMESTAMP) - INTERVAL 1 HOUR AS wm FROM events)
        |SELECT window_start, window_end, event_type, cnt
        |FROM w, m WHERE window_end <= wm""".stripMargin,
    "stream_replay_dedup" ->
      """SELECT CAST(user_id % 4 AS BIGINT) AS channel,
        |  count(DISTINCT event_id) AS dedup_cnt
        |FROM events GROUP BY 1""".stripMargin,
    "text_winnow_fingerprint" ->
      """WITH g AS (SELECT doc_id,
        |  list_transform(generate_series(1, greatest(0, length(text) - 4)),
        |    i -> (ord(substr(text, CAST(i AS INT), 1)) * 923521
        |        + ord(substr(text, CAST(i+1 AS INT), 1)) * 29791
        |        + ord(substr(text, CAST(i+2 AS INT), 1)) * 961
        |        + ord(substr(text, CAST(i+3 AS INT), 1)) * 31
        |        + ord(substr(text, CAST(i+4 AS INT), 1))) % 33554432) AS gh
        |  FROM documents),
        |w AS (SELECT doc_id, gh,
        |  list_distinct(list_transform(generate_series(1, greatest(0, len(gh) - 3)),
        |    i -> list_min(gh[CAST(i AS INT):CAST(i+3 AS INT)]))) AS fps
        |  FROM g)
        |SELECT doc_id, CAST(len(gh) AS BIGINT) AS n_grams,
        |  CAST(len(fps) AS BIGINT) AS n_fps,
        |  coalesce(CAST(list_sum(fps) AS BIGINT), 0) AS fp_checksum
        |FROM w""".stripMargin,
    "text_contamination" -> contaminationOracleSql,
    "cdc_msgpack_batch" -> msgpackBatchOracleSql,
    // The live packer emits a pack the moment it closes; its open tails are
    // still sitting in packer state, so the streaming answer is the batch
    // audit minus `open` rows — stated verbatim.
    "stream_msgpack_batch" ->
      s"SELECT * FROM (\n$msgpackBatchOracleSql\n) WHERE reason <> 'open'",
    "cdc_task_metrics" ->
      """WITH m AS (
        |  SELECT CAST(user_id % 4 AS BIGINT) AS task_id,
        |    CASE WHEN event_type = 'error' THEN 'delete' ELSE 'insert' END AS op_type,
        |    100 + (event_id * 37) % 1000 AS sz, ts
        |  FROM events WHERE user_id % 4 < 3),
        |ops AS (
        |  SELECT CAST((event_id // 300) % 3 AS BIGINT) AS task_id,
        |    ['create','pause','resume','delete'][CAST((event_id // 300) % 4 AS INT) + 1] AS op,
        |    ts, event_id
        |  FROM events WHERE event_type = 'click' AND event_id % 300 = 0),
        |lastop AS (
        |  SELECT task_id, op,
        |    row_number() OVER (PARTITION BY task_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM ops),
        |st AS (
        |  SELECT task_id,
        |    CASE WHEN op = 'pause' THEN 'Paused'
        |         WHEN op = 'delete' THEN 'Deleted'
        |         ELSE 'Running' END AS state
        |  FROM lastop WHERE rn = 1)
        |SELECT m.task_id, st.state, m.op_type, count(*) AS replicate_cnt,
        |  CAST(sum(m.sz) AS BIGINT) AS replicate_bytes,
        |  CAST(max(m.ts) AS TIMESTAMP) AS last_replicate_ts
        |FROM m JOIN st ON m.task_id = st.task_id
        |GROUP BY 1, 2, 3""".stripMargin,
    "text_ngram_freq" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
        |grams AS (
        |  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
        |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
        |  WHERE len(t) >= 3)
        |SELECT gram, count(*) AS freq FROM grams GROUP BY gram
        |ORDER BY freq DESC, gram ASC LIMIT 20""".stripMargin,
    "vec_label_centroids" ->
      """SELECT label, count(*) AS n_vectors,
        |  round(avg(sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm,
        |  round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS c1,
        |  round(avg(CAST(embedding[2] AS DOUBLE)), 4) AS c2,
        |  round(avg(CAST(embedding[3] AS DOUBLE)), 4) AS c3,
        |  round(avg(CAST(embedding[4] AS DOUBLE)), 4) AS c4
        |FROM embeddings GROUP BY label""".stripMargin,
    "vec_dim_stats" ->
      """SELECT CAST(i AS BIGINT) AS dim, count(*) AS n,
        |  round(avg(CAST(embedding[i] AS DOUBLE)), 4) AS mean,
        |  round(stddev(CAST(embedding[i] AS DOUBLE)), 4) AS sd,
        |  round(min(CAST(embedding[i] AS DOUBLE)), 4) AS mn,
        |  round(max(CAST(embedding[i] AS DOUBLE)), 4) AS mx
        |FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
        |GROUP BY 1""".stripMargin,
    "q_pivot" ->
      """SELECT event_type,
        |  count(*) FILTER (WHERE user_id % 4 = 0) AS ch0,
        |  count(*) FILTER (WHERE user_id % 4 = 1) AS ch1,
        |  count(*) FILTER (WHERE user_id % 4 = 2) AS ch2,
        |  count(*) FILTER (WHERE user_id % 4 = 3) AS ch3,
        |  round(sum(value), 4) AS total_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |  coalesce(channel, -1) AS channel,
        |  count(*) AS cnt, round(sum(value), 4) AS total_value
        |FROM (SELECT event_type, CAST(user_id % 4 AS BIGINT) AS channel, value
        |      FROM events) t
        |GROUP BY ROLLUP (event_type, channel)""".stripMargin,
    "q_json_field" ->
      """SELECT event_type, count(*) AS cnt,
        |  round(avg(k), 4) AS avg_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t
        |WHERE k >= 50 GROUP BY event_type""".stripMargin,
    "vec_grouped_knn" ->
      """WITH n AS (SELECT vec_id, label, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = 0),
        |s AS (SELECT label, vec_id,
        |    round(list_sum(list_transform(list_zip(n.embedding, qe),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * qn), 4) AS cos
        |  FROM n, q WHERE vec_id <> 0),
        |g AS (SELECT label, vec_id AS best_vec_id, cos,
        |    row_number() OVER (PARTITION BY label ORDER BY cos DESC, vec_id ASC) AS rn FROM s)
        |SELECT label, best_vec_id, cos FROM g WHERE rn = 1
        |ORDER BY cos DESC, label ASC LIMIT 5""".stripMargin,
    "vec_hybrid_rrf" ->
      """WITH n AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |sa AS (SELECT n.vec_id,
        |    round(list_sum(list_transform(list_zip(n.embedding, q.qe),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * q.qn), 4) AS cos
        |  FROM n, (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = 0) q
        |  WHERE n.vec_id >= 2 ORDER BY cos DESC, vec_id ASC LIMIT 100),
        |sb AS (SELECT n.vec_id,
        |    round(list_sum(list_transform(list_zip(n.embedding, q.qe),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * q.qn), 4) AS cos
        |  FROM n, (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = 1) q
        |  WHERE n.vec_id >= 2 ORDER BY cos DESC, vec_id ASC LIMIT 100),
        |ra AS (SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank_a FROM sa),
        |rb AS (SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank_b FROM sb)
        |SELECT ra.vec_id, rank_a, rank_b,
        |  round(1.0 / (60 + rank_a) + 1.0 / (60 + rank_b), 4) AS rrf
        |FROM ra JOIN rb ON ra.vec_id = rb.vec_id
        |ORDER BY rrf DESC, ra.vec_id ASC LIMIT 10""".stripMargin,
    "cdc_ttl_expiry" ->
      """WITH snap AS (
        |  SELECT user_id, CAST(user_id % 4 AS BIGINT) AS channel,
        |    CAST(max(ts) FILTER (WHERE event_type <> 'error') AS TIMESTAMP) AS last_upsert_ts,
        |    CAST(max(ts) FILTER (WHERE event_type = 'error') AS TIMESTAMP) AS last_delete_ts,
        |    count(*) FILTER (WHERE event_type <> 'error') AS upserts
        |  FROM events GROUP BY user_id),
        |h AS (SELECT CAST(max(ts) AS TIMESTAMP) AS head_ts FROM events)
        |SELECT user_id, channel, last_upsert_ts,
        |  last_upsert_ts + INTERVAL 6 HOUR AS expire_ts, upserts
        |FROM snap, h
        |WHERE last_upsert_ts IS NOT NULL
        |  AND (last_delete_ts IS NULL OR last_upsert_ts >= last_delete_ts)
        |  AND last_upsert_ts + INTERVAL 6 HOUR <= head_ts""".stripMargin,
    "q_point_get" ->
      """SELECT vec_id, label, CAST(len(embedding) AS BIGINT) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 4) AS e1,
        |  round(sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
        |FROM embeddings WHERE vec_id IN (3, 17, 42, 99, 123)""".stripMargin,
    "vec_l2_knn" ->
      """WITH n AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(sqrt(greatest(0.0, n.nrm * n.nrm + qn * qn -
        |    2.0 * list_sum(list_transform(list_zip(n.embedding, qe),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))))), 4) AS l2_dist
        |FROM n, q WHERE vec_id <> 0
        |ORDER BY l2_dist ASC, vec_id ASC LIMIT 10""".stripMargin,
    "vec_ip_knn" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(list_sum(list_transform(list_zip(embedding, qe),
        |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 4) AS ip
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY ip DESC, vec_id ASC LIMIT 10""".stripMargin,
    "vec_binary_knn" ->
      """WITH w AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(range(0, 32),
        |      i -> CASE WHEN embedding[i + 1] > 0 THEN 1::BIGINT << i ELSE 0 END)) AS BIGINT) AS w0,
        |    CAST(list_sum(list_transform(range(0, 32),
        |      i -> CASE WHEN embedding[i + 33] > 0 THEN 1::BIGINT << i ELSE 0 END)) AS BIGINT) AS w1
        |  FROM embeddings),
        |q AS (SELECT w0 AS qw0, w1 AS qw1 FROM w WHERE vec_id = 0)
        |SELECT vec_id,
        |  CAST(bit_count(xor(w0, qw0)) + bit_count(xor(w1, qw1)) AS BIGINT) AS hamming
        |FROM w, q WHERE vec_id <> 0
        |ORDER BY hamming ASC, vec_id ASC LIMIT 10""".stripMargin,
    "vec_lsh_search" ->
      """WITH n AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
        |    CAST(list_sum(list_transform(range(0, 8),
        |      i -> CASE WHEN embedding[i + 1] > 0 THEN 1::BIGINT << i ELSE 0 END)) AS BIGINT) AS bk
        |  FROM embeddings),
        |q AS (SELECT embedding AS qe, nrm AS qn, bk AS qb FROM n WHERE vec_id = 0),
        |probes AS (
        |  SELECT qb AS pb FROM q
        |  UNION ALL SELECT xor(qb, 1 << i) FROM q, unnest(generate_series(0, 7)) AS u(i))
        |SELECT vec_id, n.bk AS bucket,
        |  round(list_sum(list_transform(list_zip(n.embedding, qe),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * qn), 4) AS cos
        |FROM n JOIN probes ON n.bk = probes.pb, q
        |WHERE vec_id <> 0
        |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin,
    // IVF is oracle-checkable because the "index build" is deterministic:
    // centroids are the first nlist vectors, assignment is argmax cosine.
    "vec_ivf_search" ->
      """WITH n AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM n WHERE vec_id < 16),
        |assign AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT n.vec_id, cid AS cluster,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        list_sum(list_transform(list_zip(n.embedding, ce),
        |          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * cn) DESC,
        |        cid ASC) AS rn
        |    FROM n, cents) t WHERE rn = 1),
        |q AS (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = 0),
        |probed AS (
        |  SELECT cid AS cluster FROM cents, q
        |  ORDER BY list_sum(list_transform(list_zip(ce, qe),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (cn * qn) DESC, cid ASC
        |  LIMIT 4)
        |SELECT n.vec_id, a.cluster,
        |  round(list_sum(list_transform(list_zip(n.embedding, qe),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * qn), 4) AS cos
        |FROM n JOIN assign a ON n.vec_id = a.vec_id
        |JOIN probed p ON a.cluster = p.cluster, q
        |WHERE n.vec_id <> 0
        |ORDER BY cos DESC, n.vec_id ASC LIMIT 10""".stripMargin,
    // Multi-query IVF: same deterministic index; per-query probe sets
    // (top-nprobe centroids), per-query top-k over probed clusters only.
    // n is referenced 4x — MATERIALIZED keeps DuckDB from re-inlining the
    // norm computation per reference (the round-7 oracle-cost lesson).
    "vec_ivf_join" ->
      """WITH n AS MATERIALIZED (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM n WHERE vec_id < 16),
        |assign AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT n.vec_id, cid AS cluster,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        list_sum(list_transform(list_zip(n.embedding, ce),
        |          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * cn) DESC,
        |        cid ASC) AS rn
        |    FROM n, cents WHERE n.vec_id >= 8) t WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, embedding AS qe, nrm AS qn FROM n WHERE vec_id < 8),
        |probes AS (
        |  SELECT q_id, cluster FROM (
        |    SELECT q.q_id, cid AS cluster,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        list_sum(list_transform(list_zip(ce, qe),
        |          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (cn * qn) DESC,
        |        cid ASC) AS pr
        |    FROM cents, q) t WHERE pr <= 4),
        |s AS (
        |  SELECT q.q_id, n.vec_id, a.cluster,
        |    round(list_sum(list_transform(list_zip(n.embedding, qe),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * qn), 4) AS cos
        |  FROM n JOIN assign a ON n.vec_id = a.vec_id
        |  JOIN probes p ON a.cluster = p.cluster
        |  JOIN q ON q.q_id = p.q_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk FROM s)
        |SELECT q_id, vec_id, cluster, cos, rk FROM r WHERE rk <= 3""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
        |  FROM events),
        |s AS (
        |  SELECT user_id, us, event_id,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |sid AS (
        |  SELECT user_id, us,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM s),
        |per AS (
        |  SELECT user_id, session_id, count(*) AS n_events,
        |    min(us) AS s_start, max(us) AS s_end
        |  FROM sid GROUP BY user_id, session_id)
        |SELECT user_id, max(session_id) AS n_sessions,
        |  max(n_events) AS max_session_events,
        |  CAST(sum(n_events) AS BIGINT) AS total_events,
        |  max(s_end - s_start) AS max_session_us
        |FROM per GROUP BY user_id""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
        |grams AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, hash(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS gram
        |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
        |  WHERE len(t) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS s
        |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS MATERIALIZED (
        |  SELECT doc_a, doc_b
        |  FROM shared JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |  WHERE round(CAST(s AS DOUBLE) / (ca.n + cb.n - s), 4) >= 0.5),
        |edges AS MATERIALIZED (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |cc AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)
        |SELECT d.doc_id,
        |  coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
        |  d.doc_id = coalesce(cc.cluster_id, d.doc_id) AS is_canonical
        |FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id""".stripMargin,
    // Same linear union-as-of crossings as cdc_barrier_ts (see its note).
    "cdc_ddl_apply" ->
      """WITH ddls AS MATERIALIZED (
        |  SELECT event_id AS ddl_id, ts AS ddl_ts FROM events
        |  WHERE event_type = 'signup' AND event_id % 500 = 0),
        |q AS (SELECT ddl_id, ddl_ts, channel
        |      FROM ddls, unnest(generate_series(0, 3)) AS c(channel)),
        |e AS (SELECT CAST(user_id % 4 AS BIGINT) AS channel, ts FROM events),
        |u AS (
        |  SELECT channel, ts, 0 AS is_probe, ts AS ev_ts, NULL::BIGINT AS ddl_id FROM e
        |  UNION ALL
        |  SELECT channel, ddl_ts AS ts, 1 AS is_probe, NULL AS ev_ts, ddl_id FROM q),
        |r AS (
        |  SELECT channel, is_probe, ddl_id,
        |    min(ev_ts) OVER (PARTITION BY channel ORDER BY ts, is_probe DESC
        |                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS first_crossing
        |  FROM u),
        |crossings AS (
        |  SELECT ddl_id, channel, first_crossing
        |  FROM r WHERE is_probe = 1 AND first_crossing IS NOT NULL),
        |bar AS (
        |  SELECT ddl_id, max(first_crossing) AS barrier_ts
        |  FROM crossings GROUP BY ddl_id HAVING count(*) = 4),
        |ops AS (
        |  SELECT ddl_id, barrier_ts,
        |    CAST((ddl_id // 500) % 3 AS BIGINT) AS collection_id,
        |    ['create_collection','create_partition','drop_partition','drop_collection'
        |      ][CAST((ddl_id // 500) % 4 AS INT) + 1] AS op
        |  FROM bar),
        |cc AS (
        |  SELECT collection_id, op AS last_cc_op,
        |    row_number() OVER (PARTITION BY collection_id
        |                       ORDER BY barrier_ts DESC, ddl_id DESC) AS rn
        |  FROM ops WHERE op IN ('create_collection', 'drop_collection')),
        |g AS (
        |  SELECT collection_id, count(*) AS n_ddls, max(ddl_id) AS last_ddl_id,
        |    CAST(max(barrier_ts) AS TIMESTAMP) AS last_applied_ts,
        |    count(*) FILTER (WHERE op = 'create_partition')
        |      - count(*) FILTER (WHERE op = 'drop_partition') AS live_partitions
        |  FROM ops GROUP BY collection_id)
        |SELECT g.collection_id,
        |  coalesce(c.last_cc_op = 'create_collection', FALSE) AS alive,
        |  g.n_ddls, g.last_ddl_id, g.last_applied_ts, g.live_partitions
        |FROM g LEFT JOIN (SELECT * FROM cc WHERE rn = 1) c
        |  ON g.collection_id = c.collection_id""".stripMargin,
    "cdc_task_state" ->
      """WITH ops AS (
        |  SELECT CAST((event_id // 300) % 3 AS BIGINT) AS task_id,
        |    ['create','pause','resume','delete'][CAST((event_id // 300) % 4 AS INT) + 1] AS op,
        |    ts, event_id
        |  FROM events WHERE event_type = 'click' AND event_id % 300 = 0),
        |lastop AS (
        |  SELECT task_id, op, ts,
        |    row_number() OVER (PARTITION BY task_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM ops),
        |g AS (SELECT task_id, count(*) AS n_ops FROM ops GROUP BY task_id),
        |pos AS (
        |  SELECT channel, ts AS pos_ts, event_id AS pos_event_id FROM (
        |    SELECT CAST(user_id % 4 AS BIGINT) AS channel, ts, event_id,
        |      row_number() OVER (PARTITION BY user_id % 4
        |                         ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) t WHERE rn = 1)
        |SELECT g.task_id,
        |  CASE WHEN l.op = 'pause' THEN 'Paused'
        |       WHEN l.op = 'delete' THEN 'Deleted'
        |       ELSE 'Running' END AS state,
        |  g.n_ops, l.op AS last_op, CAST(l.ts AS TIMESTAMP) AS last_op_ts,
        |  CAST(p.pos_ts AS TIMESTAMP) AS pos_ts, p.pos_event_id
        |FROM g JOIN (SELECT * FROM lastop WHERE rn = 1) l ON g.task_id = l.task_id
        |JOIN pos p ON g.task_id = p.channel""".stripMargin,
    // Streaming task fold ≡ the batch control-plane fold — shares its oracle.
    "stream_task_state" ->
      """WITH ops AS (
        |  SELECT CAST((event_id // 300) % 3 AS BIGINT) AS task_id,
        |    ['create','pause','resume','delete'][CAST((event_id // 300) % 4 AS INT) + 1] AS op,
        |    ts, event_id
        |  FROM events WHERE event_type = 'click' AND event_id % 300 = 0),
        |lastop AS (
        |  SELECT task_id, op, ts,
        |    row_number() OVER (PARTITION BY task_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM ops),
        |g AS (SELECT task_id, count(*) AS n_ops FROM ops GROUP BY task_id),
        |pos AS (
        |  SELECT channel, ts AS pos_ts, event_id AS pos_event_id FROM (
        |    SELECT CAST(user_id % 4 AS BIGINT) AS channel, ts, event_id,
        |      row_number() OVER (PARTITION BY user_id % 4
        |                         ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) t WHERE rn = 1)
        |SELECT g.task_id,
        |  CASE WHEN l.op = 'pause' THEN 'Paused'
        |       WHEN l.op = 'delete' THEN 'Deleted'
        |       ELSE 'Running' END AS state,
        |  g.n_ops, l.op AS last_op, CAST(l.ts AS TIMESTAMP) AS last_op_ts,
        |  CAST(p.pos_ts AS TIMESTAMP) AS pos_ts, p.pos_event_id
        |FROM g JOIN (SELECT * FROM lastop WHERE rn = 1) l ON g.task_id = l.task_id
        |JOIN pos p ON g.task_id = p.channel""".stripMargin,
    "cdc_collection_watermark" ->
      """SELECT collection_id, channel, channel_max_ts, channel_cnt,
        |  min(channel_max_ts) OVER (PARTITION BY collection_id) AS collection_watermark
        |FROM (
        |  SELECT CAST(user_id % 3 AS BIGINT) AS collection_id,
        |    CAST(user_id % 4 AS BIGINT) AS channel,
        |    CAST(max(ts) AS TIMESTAMP) AS channel_max_ts, count(*) AS channel_cnt
        |  FROM events GROUP BY 1, 2) t""".stripMargin,
    "cdc_kafka_format" ->
      """SELECT event_id, CAST(user_id % 4 AS BIGINT) AS channel,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'insert' END AS msg_type,
        |  CASE WHEN event_type = 'error' THEN
        |    '{"name":"user_id","type":"Int64","value":' || user_id || '}'
        |  ELSE
        |    '[{"name":"user_id","type":"Int64","value":' || user_id ||
        |    '},{"name":"event_id","type":"Int64","value":' || event_id ||
        |    '},{"name":"event_type","type":"VarChar","value":"' || event_type ||
        |    '"},{"name":"ts","type":"Int64","value":' ||
        |    ((epoch_ms(CAST(ts AS TIMESTAMP)) << 18) + (event_id % 262144)) ||
        |    '},{"name":"props","type":"VarChar","value":"' ||
        |    replace(replace(props, '\', '\\'), '"', '\"') || '"}]'
        |  END AS kafka_value
        |FROM events""".stripMargin,
    // Streaming serialization ≡ the batch formatter — shares its oracle.
    "stream_kafka_format" ->
      """SELECT event_id, CAST(user_id % 4 AS BIGINT) AS channel,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'insert' END AS msg_type,
        |  CASE WHEN event_type = 'error' THEN
        |    '{"name":"user_id","type":"Int64","value":' || user_id || '}'
        |  ELSE
        |    '[{"name":"user_id","type":"Int64","value":' || user_id ||
        |    '},{"name":"event_id","type":"Int64","value":' || event_id ||
        |    '},{"name":"event_type","type":"VarChar","value":"' || event_type ||
        |    '"},{"name":"ts","type":"Int64","value":' ||
        |    ((epoch_ms(CAST(ts AS TIMESTAMP)) << 18) + (event_id % 262144)) ||
        |    '},{"name":"props","type":"VarChar","value":"' ||
        |    replace(replace(props, '\', '\\'), '"', '\"') || '"}]'
        |  END AS kafka_value
        |FROM events""".stripMargin,
    // Streaming fold ≡ the batch per-collection watermark — shares its oracle.
    "stream_collection_watermark" ->
      """SELECT collection_id, channel, channel_max_ts, channel_cnt,
        |  min(channel_max_ts) OVER (PARTITION BY collection_id) AS collection_watermark
        |FROM (
        |  SELECT CAST(user_id % 3 AS BIGINT) AS collection_id,
        |    CAST(user_id % 4 AS BIGINT) AS channel,
        |    CAST(max(ts) AS TIMESTAMP) AS channel_max_ts, count(*) AS channel_cnt
        |  FROM events GROUP BY 1, 2) t""".stripMargin,
    "cdc_position_log" ->
      """WITH ev AS (
        |  SELECT CAST(user_id % 3 AS BIGINT) AS collection_id,
        |    CAST(user_id % 4 AS BIGINT) AS channel, ts, event_id
        |  FROM events),
        |saves AS (
        |  SELECT collection_id, channel, count(*) AS n_saves,
        |    max(ROW(ts, event_id)) AS p
        |  FROM ev WHERE event_id % 100 = 0
        |  GROUP BY collection_id, channel),
        |latest AS (
        |  SELECT collection_id, channel, n_saves,
        |    CAST(p[1] AS TIMESTAMP) AS pos_ts, p[2] AS pos_event_id
        |  FROM saves)
        |SELECT l.collection_id, l.channel, l.n_saves, l.pos_ts, l.pos_event_id,
        |  count(*) FILTER (WHERE (e.ts, e.event_id) > (l.pos_ts, l.pos_event_id))
        |    AS pending_after_reload
        |FROM ev e JOIN latest l
        |  ON e.collection_id = l.collection_id AND e.channel = l.channel
        |GROUP BY ALL""".stripMargin,
    // The codec oracle rebuilds the protobuf wire bytes (tag+len+payload,
    // 9-byte varint TSO) with the same hex construction and states the
    // decoded fields as the originals + roundtrip TRUE; Spark's side
    // genuinely re-parses its own blob, so a broken encode OR decode
    // flips a column and fails the hash.
    "cdc_position_codec" ->
      s"""WITH saves AS (
        |  SELECT CAST(user_id % 3 AS BIGINT) AS collection_id,
        |    CAST(user_id % 4 AS BIGINT) AS channel,
        |    max(ROW(ts, event_id)) AS p
        |  FROM events WHERE event_id % 100 = 0
        |  GROUP BY 1, 2),
        |pos AS (
        |  SELECT collection_id, channel,
        |    CAST(p[1] AS TIMESTAMP) AS pos_ts, p[2] AS pos_event_id,
        |    'by-dev-rootcoord-dml_' || channel AS channel_name,
        |    (epoch_ms(CAST(p[1] AS TIMESTAMP)) << 18) + (p[2] % 262144) AS tso
        |  FROM saves),
        |enc AS (
        |  SELECT *,
        |    '0A' || lpad(to_hex(length(channel_name)), 2, '0') || hex(channel_name)
        |    || '1208' || lpad(to_hex(pos_event_id), 16, '0') || '20'
        |    || ${(0 until 8).map(j =>
               s"lpad(to_hex(((tso >> ${7 * j}) & 127) | 128), 2, '0')")
               .mkString(" || ")}
        |    || lpad(to_hex((tso >> 56) & 127), 2, '0') AS poshex
        |  FROM pos)
        |SELECT collection_id, channel,
        |  CAST(channel % 3 AS BIGINT) AS task_id,
        |  'cdc/task_position/' || (channel % 3) || '/' || collection_id AS store_key,
        |  to_base64(unhex(poshex)) AS pos_b64,
        |  channel_name AS decoded_channel_name,
        |  pos_event_id AS decoded_event_id,
        |  epoch_ms(pos_ts) AS decoded_phys_ms,
        |  TRUE AS roundtrip_ok
        |FROM enc""".stripMargin,
    // Deterministic restatement of channel_mapping.go's greedy fill:
    // in index order, key idx on the bigger side maps to idx DIV
    // averageCnt on the smaller side (averageCnt = ceil ratio).
    "cdc_channel_mapping" ->
      """WITH src AS (
        |  SELECT DISTINCT CAST(user_id % 4 AS BIGINT) AS src_idx FROM events),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS source_cnt FROM src),
        |scen(scenario, target_cnt) AS (VALUES
        |  ('merge', CAST(3 AS BIGINT)), ('same', CAST(4 AS BIGINT)),
        |  ('split', CAST(6 AS BIGINT))),
        |grid AS (
        |  SELECT scenario, target_cnt, source_cnt,
        |    CASE WHEN source_cnt = target_cnt THEN 'same'
        |         WHEN source_cnt > target_cnt THEN 'source_more'
        |         ELSE 'target_more' END AS mode,
        |    CASE WHEN source_cnt = target_cnt THEN CAST(1 AS BIGINT)
        |         WHEN source_cnt > target_cnt
        |           THEN (source_cnt + target_cnt - 1) // target_cnt
        |         ELSE (target_cnt + source_cnt - 1) // source_cnt
        |    END AS average_cnt
        |  FROM scen, m),
        |keys AS (
        |  SELECT g.*, unnest(generate_series(0, greatest(source_cnt, target_cnt) - 1))
        |    AS key_idx
        |  FROM grid g),
        |mapped AS (
        |  SELECT *,
        |    CASE WHEN mode = 'target_more' THEN key_idx // average_cnt
        |         ELSE key_idx END AS src_idx,
        |    CASE WHEN mode = 'source_more' THEN key_idx // average_cnt
        |         ELSE key_idx END AS tgt_idx
        |  FROM keys)
        |SELECT scenario, mode,
        |  CASE WHEN mode = 'target_more' THEN 'target' ELSE 'source' END AS key_side,
        |  source_cnt, target_cnt, average_cnt,
        |  'by-dev-rootcoord-dml_' || src_idx AS source_channel,
        |  'target-rootcoord-dml_' || tgt_idx AS target_channel
        |FROM mapped JOIN src USING (src_idx)""".stripMargin,
    "cdc_name_mapping" ->
      """WITH cw AS (
        |  SELECT CAST(user_id % 3 AS BIGINT) AS collection_id,
        |    CAST(user_id % 4 AS BIGINT) AS channel,
        |    max(ts) AS channel_max_ts, count(*) AS channel_cnt
        |  FROM events GROUP BY 1, 2),
        |state AS (
        |  SELECT collection_id,
        |    CAST(min(channel_max_ts) AS TIMESTAMP) AS collection_watermark,
        |    CAST(sum(channel_cnt) AS BIGINT) AS msgs
        |  FROM cw GROUP BY collection_id),
        |colls AS (
        |  SELECT collection_id, CAST(collection_id % 3 AS BIGINT) AS task_id,
        |    'src_db_' || (collection_id % 2) AS source_db,
        |    'coll_' || collection_id AS source_collection,
        |    collection_watermark, msgs
        |  FROM state),
        |exact(rule_src_db, rule_src_coll, rule_dst_db, rule_dst_coll) AS (
        |  VALUES ('src_db_0', 'coll_0', 'dst_db_0', 'coll_0_replica')),
        |wild(wild_src_db, wild_dst_db) AS (VALUES ('src_db_1', 'dst_db_1'))
        |SELECT c.collection_id, c.task_id, c.source_db, c.source_collection,
        |  coalesce(e.rule_dst_db, w.wild_dst_db, c.source_db) AS target_db,
        |  coalesce(e.rule_dst_coll, c.source_collection) AS target_collection,
        |  CASE WHEN e.rule_dst_db IS NOT NULL THEN 'exact'
        |       WHEN w.wild_dst_db IS NOT NULL THEN 'db_wildcard'
        |       ELSE 'none' END AS rule,
        |  c.collection_watermark, c.msgs
        |FROM colls c
        |LEFT JOIN exact e ON c.source_db = e.rule_src_db
        |  AND c.source_collection = e.rule_src_coll
        |LEFT JOIN wild w ON c.source_db = w.wild_src_db""".stripMargin,
    // The op-log CTE (all 22 initOPMessageFuncs types + Import) is
    // generated from the same Scala constants the operator uses — the
    // name list and surrogate derivations can never drift.
    "cdc_op_messages" ->
      s"""WITH $opLogSql
        |SELECT collection_id,
        |  coalesce((max(ROW(ts, event_id, op))
        |      FILTER (WHERE op IN ('create_index', 'drop_index')))[3]
        |    = 'create_index', FALSE) AS indexed,
        |  count(*) FILTER (WHERE op = 'alter_index') AS index_version,
        |  coalesce((max(ROW(ts, event_id, op))
        |      FILTER (WHERE op IN ('load_collection', 'release_collection')))[3]
        |    = 'load_collection', FALSE) AS loaded,
        |  coalesce((max(ROW(ts, event_id, op))
        |      FILTER (WHERE op IN ('load_partitions', 'release_partitions')))[3]
        |    = 'load_partitions', FALSE) AS partitions_loaded,
        |  count(*) FILTER (WHERE op = 'flush') AS n_flushes,
        |  count(*) FILTER (WHERE op = 'import') AS n_imports,
        |  count(*) AS n_ops,
        |  CAST(max(ts) AS TIMESTAMP) AS last_op_ts
        |FROM ops
        |WHERE op IN (${graft.cdc.Cdc.CollectionOpNames.map(n => s"'$n'").mkString(", ")})
        |GROUP BY collection_id""".stripMargin,
    "cdc_rbac_state" ->
      s"""WITH $opLogSql,
        |entities AS (
        |  SELECT 'database' AS entity_kind, db_id AS entity_id,
        |    CASE WHEN op = 'create_database' THEN 'up'
        |         WHEN op = 'drop_database' THEN 'down' END AS life,
        |    op = 'alter_database' AS bump, ts, event_id
        |  FROM ops WHERE op IN ('create_database', 'drop_database', 'alter_database')
        |  UNION ALL
        |  SELECT 'credential', user_sid,
        |    CASE WHEN op = 'create_credential' THEN 'up'
        |         WHEN op = 'delete_credential' THEN 'down' END,
        |    op = 'update_credential', ts, event_id
        |  FROM ops WHERE op IN ('create_credential', 'delete_credential', 'update_credential')
        |  UNION ALL
        |  SELECT 'role', role_id,
        |    CASE WHEN op = 'create_role' THEN 'up'
        |         WHEN op = 'drop_role' THEN 'down' END,
        |    op IN ('operate_user_role', 'operate_privilege', 'operate_privilege_v2'),
        |    ts, event_id
        |  FROM ops WHERE op IN ('create_role', 'drop_role', 'operate_user_role',
        |                        'operate_privilege', 'operate_privilege_v2')
        |  UNION ALL
        |  SELECT 'privilege_group', group_id,
        |    CASE WHEN op = 'create_privilege_group' THEN 'up'
        |         WHEN op = 'drop_privilege_group' THEN 'down' END,
        |    op = 'operate_privilege_group', ts, event_id
        |  FROM ops WHERE op IN ('create_privilege_group', 'drop_privilege_group',
        |                        'operate_privilege_group')
        |  UNION ALL
        |  SELECT 'user_role', user_sid * 4 + role_id,
        |    CASE WHEN action = 'grant' THEN 'up' ELSE 'down' END,
        |    FALSE, ts, event_id
        |  FROM ops WHERE op = 'operate_user_role')
        |SELECT entity_kind, entity_id,
        |  coalesce((max(ROW(ts, event_id, life))
        |      FILTER (WHERE life IS NOT NULL))[3] = 'up', FALSE) AS alive,
        |  count(*) FILTER (WHERE bump) AS version,
        |  count(*) AS n_ops,
        |  CAST(max(ts) AS TIMESTAMP) AS last_op_ts
        |FROM entities GROUP BY entity_kind, entity_id""".stripMargin,
    "pipeline_clean_corpus" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
        |grams AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, hash(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS gram
        |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
        |  WHERE len(t) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS s
        |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS MATERIALIZED (
        |  SELECT doc_a, doc_b
        |  FROM shared JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |  WHERE round(CAST(s AS DOUBLE) / (ca.n + cb.n - s), 4) >= 0.5),
        |edges AS MATERIALIZED (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |cc AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
        |canon AS (
        |  SELECT d.doc_id FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
        |  WHERE d.doc_id = coalesce(cc.cluster_id, d.doc_id)),
        |tq AS (SELECT doc_id, text,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
        |q AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        |  round(0.4 * (CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk))
        |      + 0.4 * (1.0 - CAST(len(list_filter(tk, x -> x IN ('the','a','and','of','is'))) AS DOUBLE) / len(tk))
        |      + 0.2 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) / length(text)), 4) AS score
        |  FROM tq),
        |s AS (SELECT doc_id,
        |    CAST(len(list_filter(tk, x -> x IN ('the','a','and','of','is'))) AS BIGINT) AS s_en,
        |    len(list_filter(tk, x -> x IN ('der','die','und','das','ist'))) AS s_de,
        |    len(list_filter(tk, x -> x IN ('el','los','las','y','es'))) AS s_es,
        |    len(list_filter(tk, x -> x IN ('le','la','et','les','des'))) AS s_fr,
        |    len(list_filter(tk, x -> x IN ('de','shi','le','bu','wo'))) AS s_zh
        |  FROM tq),
        |l AS (SELECT doc_id,
        |    CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'und'
        |         WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
        |         WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
        |         WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
        |         WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
        |         ELSE 'zh' END AS guess
        |  FROM s)
        |SELECT c.doc_id, l.guess AS lang_guess, q.score, q.n_tokens
        |FROM canon c JOIN q ON c.doc_id = q.doc_id JOIN l ON c.doc_id = l.doc_id
        |WHERE q.score >= 0.72 AND l.guess <> 'und'""".stripMargin,
    "cdc_segment_stats" ->
      """SELECT CAST(user_id % 4 AS BIGINT) AS channel,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS seg_day,
        |  count(*) AS msgs, count(DISTINCT user_id) AS pks,
        |  CAST(sum(length(props)) AS BIGINT) AS payload_bytes,
        |  CAST(min(ts) AS TIMESTAMP) AS first_ts, CAST(max(ts) AS TIMESTAMP) AS last_ts
        |FROM events GROUP BY 1, 2""".stripMargin,
    // Sketch ops: internals are engine-specific BY DESIGN, so the oracle
    // asserts the published error bound — the op emits (exact, bound,
    // verdict) with the verdict computed in-engine, and the SQL restates
    // the exact side + bound and pins the verdict TRUE. An out-of-bound
    // sketch flips the boolean and fails the hash.
    "q_approx_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  count(*) AS cnt,
        |  greatest((count(DISTINCT user_id) * 12 + 99) // 100, 4) AS bound,
        |  TRUE AS approx_ok
        |FROM events GROUP BY event_type""".stripMargin,
    // quantile_cont uses the same (n-1)*q linear interpolation as Spark's
    // exact percentile, so the rounded exacts hash-match; the ok_* booleans
    // are the sketch's rank-error guarantee at 50x slack.
    "q_value_quantiles" ->
      """SELECT event_type, count(*) AS cnt,
        |  round(quantile_cont(value, 0.5), 4) AS exact_p50,
        |  round(quantile_cont(value, 0.95), 4) AS exact_p95,
        |  round(quantile_cont(value, 0.99), 4) AS exact_p99,
        |  TRUE AS ok_p50, TRUE AS ok_p95, TRUE AS ok_p99
        |FROM events GROUP BY event_type""".stripMargin,
    "q_hll_merge" ->
      """SELECT CAST(4 AS BIGINT) AS n_channels,
        |  count(DISTINCT user_id) AS exact_users,
        |  greatest((count(DISTINCT user_id) * 975 + 9999) // 10000, 16) AS bound,
        |  TRUE AS approx_ok
        |FROM events""".stripMargin,
    "dedup_simhash" -> simhashOracleSql,
    // One exploded (doc_id, k, gram) frame for 1/2/3-grams, as on the
    // Spark side; fractions are of gram POSITIONS (top2 count / (n-1)
    // 2-gram slots), so no overlap-degenerate value can exceed 1.
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, 1 AS k, t[i] AS g
        |  FROM toks, unnest(generate_series(1, len(t))) AS u(i)
        |  UNION ALL
        |  SELECT doc_id, 2, t[i] || ' ' || t[i+1]
        |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i) WHERE len(t) >= 2
        |  UNION ALL
        |  SELECT doc_id, 3, t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i) WHERE len(t) >= 3),
        |c AS (SELECT doc_id, k, g, count(*) AS c FROM g GROUP BY 1, 2, 3),
        |s AS (SELECT doc_id, k, max(c) AS mx, sum(c) AS tot, count(*) AS dst
        |  FROM c GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(max(CASE WHEN k = 1 THEN tot END) AS BIGINT) AS n_tokens,
        |  round(CAST(max(CASE WHEN k = 1 THEN mx END) AS DOUBLE)
        |    / max(CASE WHEN k = 1 THEN tot END), 4) AS top_word_frac,
        |  round(coalesce(CAST(max(CASE WHEN k = 2 THEN mx END) AS DOUBLE)
        |    / max(CASE WHEN k = 2 THEN tot END), 0.0), 4) AS top2_frac,
        |  round(coalesce(CAST(max(CASE WHEN k = 3 THEN tot END)
        |      - max(CASE WHEN k = 3 THEN dst END) AS DOUBLE)
        |    / max(CASE WHEN k = 3 THEN tot END), 0.0), 4) AS dup3_frac
        |FROM s GROUP BY doc_id""".stripMargin,
    // Knuth multiplicative hash, exact in BIGINT on both engines.
    "q_stratified_sample" ->
      """WITH b AS (
        |  SELECT o_orderstatus, o_totalprice,
        |    ((o_orderkey % 4294967296) * 31153
        |     + ((o_orderkey % 4294967296) * 40503) % 65536 * 65536)
        |      % 4294967296 % 1000 AS bucket
        |  FROM orders)
        |SELECT o_orderstatus,
        |  CASE WHEN bucket < 800 THEN 'train'
        |       WHEN bucket < 900 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_orders,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_price
        |FROM b GROUP BY 1, 2""".stripMargin,
    // Same IVF assignment CTE as vec_ivf_search, but nlist follows the
    // operator's auto rule (k ∝ corpus size, constants generated from
    // Similarity.SemMinNlist/SemClusterTarget — resolves to 16 at the
    // driver-gated corpora); then within-cluster pairs only; dup = has an
    // earlier cluster-mate at rounded cos >= 0.45.
    "dedup_semantic" ->
      s"""WITH n AS MATERIALIZED (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM n
        |  WHERE vec_id < (SELECT GREATEST(${Similarity.SemMinNlist},
        |    CEIL(count(*) / ${Similarity.SemClusterTarget}.0)) FROM embeddings)),
        |-- cos is projected to a SLIM column BEFORE the row_number window:
        |-- windowing the raw n × cents product carries both embedding lists
        |-- through the sort (~12 KB/row — 190 GB at 140k × 768-dim, a spill
        |-- death), while the staged form sorts (vec_id, cid, cos) only.
        |-- Same expression, same rows — restated for DuckDB memory only.
        |sc AS (SELECT n.vec_id, cid,
        |    list_sum(list_transform(list_zip(n.embedding, ce),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * cn) AS cos
        |  FROM n, cents),
        |assign AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, cid AS cluster,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
        |    FROM sc) t WHERE rn = 1),
        |pr AS (
        |  SELECT a2.vec_id AS vec_id, a1.cluster AS cluster,
        |    round(list_sum(list_transform(list_zip(n1.embedding, n2.embedding),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n1.nrm * n2.nrm), 4) AS cos
        |  FROM assign a1 JOIN assign a2 ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
        |  JOIN n n1 ON n1.vec_id = a1.vec_id JOIN n n2 ON n2.vec_id = a2.vec_id)
        |SELECT vec_id, cluster, count(*) AS n_earlier, max(cos) AS max_cos
        |FROM pr WHERE cos >= 0.45 GROUP BY 1, 2""".stripMargin,
    // Concat-then-chunk packing: exclusive per-shard prefix token sum in
    // doc_id order, bin = cum DIV window; per-(shard, bin) stats.
    "pipeline_pack_sequences" ->
      """WITH tc AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS tc
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, tc,
        |    CAST(COALESCE(sum(tc) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
        |  FROM tc)
        |SELECT source, cum // 512 AS bin, count(*) AS n_docs,
        |  CAST(sum(tc) AS BIGINT) AS tokens_in,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2""".stripMargin,
    // Integer rarity = N // cnt per token over corpus unigram counts; per
    // doc the position count, rarity sum, and one final double division.
    "text_rarity_score" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |freq AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM tok)
        |SELECT doc_id, count(*) AS n_toks, CAST(sum(n // cnt) AS BIGINT) AS rarity_sum,
        |  round(CAST(sum(n // cnt) AS DOUBLE) / count(*), 4) AS mean_rarity
        |FROM tok JOIN freq USING (tok), tot
        |GROUP BY doc_id""".stripMargin,
    // Same assignment, then one Lloyd step: per-(cluster, dim) mean and
    // the cosine between seed centroid and refined mean.
    "vec_kmeans_refine" ->
      """WITH n AS MATERIALIZED (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM n WHERE vec_id < 16),
        |assign AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT n.vec_id, cid AS cluster,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        list_sum(list_transform(list_zip(n.embedding, ce),
        |          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * cn) DESC,
        |        cid ASC) AS rn
        |    FROM n, cents) t WHERE rn = 1),
        |m AS (
        |  SELECT a.cluster, i AS dim, avg(CAST(e.embedding[i] AS DOUBLE)) AS m, count(*) AS n
        |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id,
        |    unnest(generate_series(1, len(e.embedding))) AS u(i)
        |  GROUP BY 1, 2)
        |SELECT m.cluster, max(m.n) AS n_assigned,
        |  round(sum(m.m * CAST(ce[dim] AS DOUBLE))
        |    / (sqrt(sum(m.m * m.m)) * max(cn)), 4) AS shift_cos,
        |  round(max(CASE WHEN dim = 1 THEN m.m END), 4) AS c1_new
        |FROM m JOIN cents c ON m.cluster = c.cid
        |GROUP BY 1""".stripMargin,
    // Per-dim min/max refit identically (exact, order-independent), then
    // the same floor(x + 0.5) code map and sequential list-fold error sums.
    "vec_scalar_quantize" ->
      """WITH st AS (
        |  SELECT i AS dim, min(CAST(embedding[i] AS DOUBLE)) AS mn,
        |    max(CAST(embedding[i] AS DOUBLE)) AS mx
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
        |  GROUP BY 1),
        |lu AS (SELECT list(mn ORDER BY dim) AS mns, list(mx - mn ORDER BY dim) AS sps FROM st),
        |e AS (
        |  SELECT vec_id,
        |    list_transform(generate_series(1, len(embedding)), i ->
        |      abs(CAST(embedding[i] AS DOUBLE) - (mns[i]
        |        + floor((CAST(embedding[i] AS DOUBLE) - mns[i]) / sps[i] * 255.0 + 0.5)
        |          * sps[i] / 255.0))) AS err,
        |    CAST(floor((CAST(embedding[1] AS DOUBLE) - mns[1]) / sps[1] * 255.0 + 0.5) AS BIGINT) AS code1
        |  FROM embeddings, lu)
        |SELECT vec_id, code1,
        |  round(list_sum(err) / len(err), 6) AS mae,
        |  round(list_max(err), 6) AS max_err
        |FROM e""".stripMargin,
  )

  /** Contamination oracle: the k=12 winnow restated with unrolled Horner
    * coefficients 31^(k-1-j) mod 2^25 (congruent to the operator's
    * fold-with-mod), then the df-capped fingerprint pair join. Generated
    * from the same constants as the operator so the sides cannot drift.
    */
  private def contaminationOracleSql: String = {
    val (k, w, minShared, maxDf) = (12, 8, 3, 20)
    val mod = 1L << 25
    val terms = (0 until k).map(j =>
      s"ord(substr(text, CAST(i+$j AS INT), 1)) * ${BigInt(31).modPow(BigInt(k - 1 - j), BigInt(mod))}::BIGINT")
      .mkString("\n        + ")
    s"""WITH g AS (SELECT doc_id,
       |  list_transform(generate_series(1, greatest(0, length(text) - ${k - 1})),
       |    i -> ($terms) % $mod) AS gh
       |  FROM documents),
       |w AS (SELECT doc_id,
       |  list_distinct(list_transform(generate_series(1, greatest(0, len(gh) - ${w - 1})),
       |    i -> list_min(gh[CAST(i AS INT):CAST(i+${w - 1} AS INT)]))) AS fps
       |  FROM g),
       |f AS (SELECT doc_id, unnest(fps) AS fp FROM w),
       |keep AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= $maxDf),
       |kept AS (SELECT f.doc_id, f.fp FROM f JOIN keep USING (fp)),
       |n AS (SELECT doc_id, count(*) AS n_fps FROM kept GROUP BY doc_id),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
       |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $minShared)
       |SELECT doc_a, doc_b, shared_fps,
       |  round(CAST(shared_fps AS DOUBLE) / least(na.n_fps, nb.n_fps), 4) AS overlap
       |FROM p JOIN n na ON p.doc_a = na.doc_id JOIN n nb ON p.doc_b = nb.doc_id""".stripMargin
  }

  /** Msgpack batch-boundary oracle: the packer's MaxCount/MaxMsgSize rules
    * (server/msgpacker/packer.go:57-90) restated as the same windowed
    * prefix-sum — oversize messages cut segments, segments chunk by
    * MaxCount. Generated from the shared [[graft.cdc.Cdc.PackMaxCount]] /
    * [[graft.cdc.Cdc.PackMaxMsgBytes]] constants so the sides cannot drift.
    */
  private def msgpackBatchOracleSql: String = {
    val n = graft.cdc.Cdc.PackMaxCount
    val s = graft.cdc.Cdc.PackMaxMsgBytes
    s"""WITH m AS (
       |  SELECT CAST(user_id % 4 AS BIGINT) AS channel, event_id,
       |    100 + (event_id * 37) % 1000 AS sz
       |  FROM events),
       |r AS (
       |  SELECT channel, event_id, sz,
       |    CASE WHEN sz > $s THEN 1 ELSE 0 END AS ov,
       |    row_number() OVER (PARTITION BY channel ORDER BY event_id) AS seq
       |  FROM m),
       |r2 AS (
       |  SELECT *, COALESCE(SUM(ov) OVER (PARTITION BY channel ORDER BY event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
       |  FROM r),
       |s2 AS (SELECT *, min(seq) OVER (PARTITION BY channel, seg) AS seg_start FROM r2),
       |b AS (
       |  SELECT channel, seg, (seq - seg_start) // $n AS chunk,
       |    count(*) AS n_msgs, CAST(sum(sz) AS BIGINT) AS batch_bytes,
       |    min(event_id) AS first_event_id, max(event_id) AS last_event_id,
       |    max(ov) AS has_ov
       |  FROM s2 GROUP BY 1, 2, 3)
       |SELECT channel,
       |  CAST(row_number() OVER (PARTITION BY channel ORDER BY seg, chunk) AS BIGINT) AS batch_id,
       |  n_msgs, batch_bytes, first_event_id, last_event_id,
       |  CASE WHEN has_ov = 1 THEN 'size'
       |       WHEN n_msgs = $n THEN 'count' ELSE 'open' END AS reason
       |FROM b""".stripMargin
  }

  /** Shared oracle CTE for the op-message log: name list and surrogate
    * derivations generated from [[graft.cdc.Cdc.OpMessageNames]] —
    * channel_writer.go's complete dispatch map as data.
    */
  private def opLogSql: String = {
    val names = graft.cdc.Cdc.OpMessageNames.map(n => s"'$n'").mkString(", ")
    val n = graft.cdc.Cdc.OpMessageNames.size
    s"""ops AS (
       |  SELECT [$names][CAST((event_id // 137) % $n AS INT) + 1] AS op,
       |    CAST((event_id // 137) % 3 AS BIGINT) AS collection_id,
       |    CAST((event_id // 137) % 2 AS BIGINT) AS db_id,
       |    CAST((event_id // 137) % 5 AS BIGINT) AS user_sid,
       |    CAST((event_id // 137) % 4 AS BIGINT) AS role_id,
       |    CAST((event_id // 137) % 3 AS BIGINT) AS group_id,
       |    CASE WHEN ((event_id // 137) // $n) % 2 = 0
       |         THEN 'grant' ELSE 'revoke' END AS action,
       |    ts, event_id
       |  FROM events WHERE event_id % 137 = 0)""".stripMargin
  }

  /** The SimHash oracle recomputes the ENTIRE fingerprint with the same
    * exact-integer hash family the operator uses
    * ([[graft.operators.Dedup.simhashBitConst]]: multiplicative bits mod
    * 2^25 over a 5-char+length token hash), then runs the same 4-chunk
    * pair join — identical fingerprints imply an identical pair set, so
    * the check is deterministic (no LSH-recall assumption). The 62 vote
    * sums and fingerprint terms are generated here from the shared
    * constants so the two sides can never drift.
    */
  private def simhashOracleSql: String = {
    val mod = graft.operators.Dedup.SimhashMod
    val half = mod / 2
    val bits = graft.operators.Dedup.SimhashBits
    val ones = (0 until bits).map(i =>
      s"count(*) FILTER (WHERE (g * ${graft.operators.Dedup.simhashBitConst(i)}) % $mod >= $half) AS o$i")
      .mkString(",\n    ")
    val fpTerms = (0 until bits).map(i =>
      s"CASE WHEN 2 * o$i > n THEN ${1L << i} ELSE 0 END").mkString("\n      + ")
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents),
       |th AS (SELECT doc_id, list_transform(t, tok ->
       |    (ord(substr(tok || '#####', 1, 1)) * 923521::BIGINT
       |     + ord(substr(tok || '#####', 2, 1)) * 29791
       |     + ord(substr(tok || '#####', 3, 1)) * 961
       |     + ord(substr(tok || '#####', 4, 1)) * 31
       |     + ord(substr(tok || '#####', 5, 1)) + length(tok)) % $mod) AS h
       |  FROM toks),
       |grams AS (
       |  SELECT DISTINCT doc_id,
       |    (h[i] * 4821 + h[i + 1] * 129 + h[i + 2]) % $mod AS g
       |  FROM th, unnest(generate_series(1, len(h) - 2)) AS u(i)
       |  WHERE len(h) >= 3),
       |votes AS (SELECT doc_id, count(*) AS n,
       |    $ones
       |  FROM grams GROUP BY doc_id),
       |fp AS (SELECT doc_id,
       |    CAST($fpTerms AS BIGINT) AS simhash
       |  FROM votes),
       |chunks AS (
       |  SELECT doc_id, simhash, c AS chunk, (simhash >> (c * 16)) & 65535 AS ck
       |  FROM fp, unnest([0, 1, 2, 3]) AS u(c))
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
       |FROM chunks x JOIN chunks y
       |  ON x.chunk = y.chunk AND x.ck = y.ck AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3""".stripMargin
  }
}
