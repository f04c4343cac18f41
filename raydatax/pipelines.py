"""Named pipelines over the driver-provided testdata tables + their ANSI-SQL
oracles (DuckDB).  This is the external correctness gate: every pipeline is
implemented Ray-Data-first here and mirrored in :data:`ORACLE_SQL`; the
harness runs both and compares row counts, schema, and value hashes.

Column-name parity rule: every computed/aggregate column is named
identically in the Ray code and the SQL.  Float discipline: ratios are
exact-operand divisions (bit-identical in both engines); order-dependent
float SUMs are rounded (2 decimals for money, 4 for means).

None of these call ``ray.init`` — the harness owns the session.
"""


from .q_cdc import (  # noqa: F401
    cdc_changelog_export,
    cdc_lww_upsert,
    conversation_summary_view,
    job_json_roundtrip,
    lake_replication,
    lake_snapshot_diff,
    lake_state_digest,
    lake_time_travel,
    scd2_transcripts,
    schema_evolution_replay,
    snapshot_cdc_orders,
    transcript_cdc_replay,
    transcript_window_replay,
)
from .q_rel import (  # noqa: F401
    cast_roundtrip,
    colocated_custkey_stats,
    colocated_orders_customer,
    colocated_user_type_join,
    customer_order_counts,
    events_group_kfold,
    events_window_dedup,
    customers_per_region,
    customers_without_orders,
    distinct_event_types,
    events_partitioned_roundtrip,
    filter_like,
    projection_filter_revenue,
    q1_pricing_summary,
    semi_join_fulfilled,
    csv_lzo_roundtrip,
    skew_salted_join,
    sql_sample_read,
    sql_split_read,
    sql_token_read,
    sql_writer_roundtrip,
    top_orders,
    transform_chain,
    url_extract,
)
from .q_text import (  # noqa: F401
    bloom_skip_scan,
    decontaminate_3gram,
    dedup_exact_prefix,
    dedup_keep_best,
    dedup_minhash,
    dedup_minhash_verified,
    dedup_simhash,
    dedup_simhash_verified,
    dedup_span_exact,
    doc_repetition,
    docs_bigram_perplexity,
    docs_bm25_topk,
    docs_cms_counts,
    docs_lm_perplexity,
    docs_phrase_search,
    docs_pmi_collocations,
    edit_distance_docs,
    fingerprint,
    incremental_bigram_perplexity,
    incremental_lm_perplexity,
    index_and_search,
    inverted_index_terms,
    jsonl_doc_roundtrip,
    key_range_scan,
    key_skip_scan,
    lang_id,
    ngram_containment_docs,
    ngram_jaccard,
    pii_redact,
    quality_ratios,
    search_topk_scroll,
    sequence_packing,
    sft_context_assembly,
    similarity_join_docs,
    text_normalize,
    token_positions,
    token_stats,
    tsdb_window_read,
)
from .q_win import (  # noqa: F401
    approx_users_hll,
    approx_users_hll_verified,
    asof_latest_purchase,
    bloom_filtered_revenue,
    busy_users,
    click_except_purchase_days,
    daily_users_hll,
    event_stream_lead_tiles,
    event_value_distribution,
    event_value_ranks,
    events_exact_sample,
    events_hopping,
    events_hourly,
    events_leakage_split,
    events_mixture_sample,
    events_temperature_sample,
    events_props_json,
    events_sample,
    events_shuffle_export,
    events_value_pivot,
    events_value_stats,
    favorite_event_type,
    lineitem_measures_melt,
    lineitem_qty_price_corr,
    orders_status_priority_cube,
    purchase_attribution,
    revenue_rollup_region,
    tfidf_terms,
    top_events_per_type,
    top_terms_heavy_hitters,
    transcript_reassembly,
    user_event_paths,
    user_moving_avg,
    user_running_totals,
    user_sessions,
    value_bucket_counts,
    view_purchase_day_intersect,
)
from .q_ann import (  # noqa: F401
    ann_cosine_topk,
    ann_ivf,
    ann_pq_verified,
    dedup_embedding,
    dedup_embedding_exact,
    embedding_components,
    embedding_kmeans,
    events_daily_users,
    events_stratified_sample,
    events_value_outliers,
    incremental_dedup,
    incremental_embedding_exact,
    incremental_minhash_verified,
    multimodal_features,
    orders_by_status,
    part_type_stats,
    revenue_by_segment,
    semantic_dedup_vecs,
    value_percentiles,
)
from .q_graph import (  # noqa: F401
    bpe_encode_counts,
    bpe_learn,
    cdc_demux_routing,
    events_profile,
    graph_components,
    graph_export_edges,
    graph_khop,
    graph_pagerank,
    graph_shortest_paths,
    graph_triangles,
    zorder_box_scan,
)

# ------------------------------------------------------------------ registry

# Registry order is LOAD-BEARING: the external correctness gate records
# only the FIRST 50 entries.  The gate window below is curated so every
# operator family lands at least one hash-certified driver row — CDC core,
# the declarative runner, each source/sink family, transformers, joins,
# windows, asof/range joins, rollup/pivot, percentiles, sketches, set ops,
# sampling, the text-prep family, every dedup modality (exact / MinHash /
# SimHash / embedding / ngram-verify / incremental ×3), ANN, multimodal,
# and the graph family.  Entries past the window are equally maintained
# and checked by the local replica gate (tools/check_oracle.py).
QUERIES = {
    # --- gate window (first 50): one row per operator family -----------
    "transcript_cdc_replay": transcript_cdc_replay,
    "cdc_lww_upsert": cdc_lww_upsert,
    "cdc_changelog_export": cdc_changelog_export,
    "snapshot_cdc_orders": snapshot_cdc_orders,
    "scd2_transcripts": scd2_transcripts,
    "conversation_summary_view": conversation_summary_view,
    "sft_context_assembly": sft_context_assembly,
    "job_json_roundtrip": job_json_roundtrip,
    "events_partitioned_roundtrip": events_partitioned_roundtrip,
    "sql_split_read": sql_split_read,
    "sql_writer_roundtrip": sql_writer_roundtrip,
    "search_topk_scroll": search_topk_scroll,
    "key_range_scan": key_range_scan,
    "tsdb_window_read": tsdb_window_read,
    "jsonl_doc_roundtrip": jsonl_doc_roundtrip,
    "transform_chain": transform_chain,
    "colocated_orders_customer": colocated_orders_customer,
    "revenue_by_segment": revenue_by_segment,
    "lake_state_digest": lake_state_digest,
    "user_sessions": user_sessions,
    "asof_latest_purchase": asof_latest_purchase,
    "revenue_rollup_region": revenue_rollup_region,
    "colocated_custkey_stats": colocated_custkey_stats,
    "value_percentiles": value_percentiles,
    "approx_users_hll_verified": approx_users_hll_verified,
    "top_terms_heavy_hitters": top_terms_heavy_hitters,
    "events_temperature_sample": events_temperature_sample,
    "lang_id": lang_id,
    "decontaminate_3gram": decontaminate_3gram,
    "sequence_packing": sequence_packing,
    "events_window_dedup": events_window_dedup,
    "dedup_span_exact": dedup_span_exact,
    "dedup_minhash_verified": dedup_minhash_verified,
    "dedup_simhash_verified": dedup_simhash_verified,
    "similarity_join_docs": similarity_join_docs,
    "lake_time_travel": lake_time_travel,
    "incremental_minhash_verified": incremental_minhash_verified,
    "incremental_embedding_exact": incremental_embedding_exact,
    "ann_pq_verified": ann_pq_verified,
    "multimodal_features": multimodal_features,
    "graph_export_edges": graph_export_edges,
    "docs_bigram_perplexity": docs_bigram_perplexity,
    "lake_snapshot_diff": lake_snapshot_diff,
    "bpe_learn": bpe_learn,
    "schema_evolution_replay": schema_evolution_replay,
    "bloom_skip_scan": bloom_skip_scan,
    "docs_lm_perplexity": docs_lm_perplexity,
    "events_shuffle_export": events_shuffle_export,
    "inverted_index_terms": inverted_index_terms,
    "semantic_dedup_vecs": semantic_dedup_vecs,
    # --- beyond the gate window: locally gate-checked (tools/check_oracle.py)
    # (r5 recuration: these five moved out of the window to make room for
    # the round-4 flagship families; their families each keep >=1 row in
    # the window and their local hash-greenness is recorded in COVERAGE.md)
    "cast_roundtrip": cast_roundtrip,
    "events_value_pivot": events_value_pivot,
    "events_profile": events_profile,
    "tfidf_terms": tfidf_terms,
    "graph_pagerank": graph_pagerank,
    "customers_without_orders": customers_without_orders,
    "events_sample": events_sample,
    "token_stats": token_stats,
    "view_purchase_day_intersect": view_purchase_day_intersect,
    "dedup_exact_prefix": dedup_exact_prefix,
    "purchase_attribution": purchase_attribution,
    "q1_pricing_summary": q1_pricing_summary,
    "url_extract": url_extract,
    "event_value_ranks": event_value_ranks,
    "quality_ratios": quality_ratios,
    "fingerprint": fingerprint,
    "dedup_embedding_exact": dedup_embedding_exact,
    "ann_cosine_topk": ann_cosine_topk,
    "bpe_encode_counts": bpe_encode_counts,
    "ngram_jaccard": ngram_jaccard,
    "cdc_demux_routing": cdc_demux_routing,
    "graph_shortest_paths": graph_shortest_paths,
    "transcript_window_replay": transcript_window_replay,
    "key_skip_scan": key_skip_scan,
    "sql_token_read": sql_token_read,
    "sql_sample_read": sql_sample_read,
    "top_orders": top_orders,
    "customers_per_region": customers_per_region,
    "projection_filter_revenue": projection_filter_revenue,
    "distinct_event_types": distinct_event_types,
    "filter_like": filter_like,
    "token_positions": token_positions,
    "doc_repetition": doc_repetition,
    "text_normalize": text_normalize,
    "pii_redact": pii_redact,
    "dedup_minhash": dedup_minhash,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding": dedup_embedding,
    "events_hourly": events_hourly,
    "lineitem_measures_melt": lineitem_measures_melt,
    "events_value_stats": events_value_stats,
    "busy_users": busy_users,
    "value_bucket_counts": value_bucket_counts,
    "favorite_event_type": favorite_event_type,
    "bloom_filtered_revenue": bloom_filtered_revenue,
    "lineitem_qty_price_corr": lineitem_qty_price_corr,
    "user_event_paths": user_event_paths,
    "transcript_reassembly": transcript_reassembly,
    "customer_order_counts": customer_order_counts,
    "event_value_distribution": event_value_distribution,
    "event_stream_lead_tiles": event_stream_lead_tiles,
    "approx_users_hll": approx_users_hll,
    "daily_users_hll": daily_users_hll,
    "click_except_purchase_days": click_except_purchase_days,
    "top_events_per_type": top_events_per_type,
    "events_hopping": events_hopping,
    "user_running_totals": user_running_totals,
    "user_moving_avg": user_moving_avg,
    "ann_ivf": ann_ivf,
    "events_stratified_sample": events_stratified_sample,
    "embedding_components": embedding_components,
    "orders_by_status": orders_by_status,
    "part_type_stats": part_type_stats,
    "events_daily_users": events_daily_users,
    "graph_khop": graph_khop,
    "graph_components": graph_components,
    "graph_triangles": graph_triangles,
    "lake_replication": lake_replication,
    "index_and_search": index_and_search,
    "events_mixture_sample": events_mixture_sample,
    "events_leakage_split": events_leakage_split,
    "ngram_containment_docs": ngram_containment_docs,
    "events_exact_sample": events_exact_sample,
    "edit_distance_docs": edit_distance_docs,
    "events_value_outliers": events_value_outliers,
    "semi_join_fulfilled": semi_join_fulfilled,
    "docs_bm25_topk": docs_bm25_topk,
    "docs_phrase_search": docs_phrase_search,
    "embedding_kmeans": embedding_kmeans,
    "incremental_dedup": incremental_dedup,
    "events_props_json": events_props_json,
    "orders_status_priority_cube": orders_status_priority_cube,
    "zorder_box_scan": zorder_box_scan,
    "docs_cms_counts": docs_cms_counts,
    "docs_pmi_collocations": docs_pmi_collocations,
    "incremental_lm_perplexity": incremental_lm_perplexity,
    "dedup_keep_best": dedup_keep_best,
    "events_group_kfold": events_group_kfold,
    "incremental_bigram_perplexity": incremental_bigram_perplexity,
    "skew_salted_join": skew_salted_join,
    "colocated_user_type_join": colocated_user_type_join,
    "csv_lzo_roundtrip": csv_lzo_roundtrip,
}

# The BPE oracle unrolls the learner's merge rounds as chained CTEs (the
# graph_pagerank pattern): round r = pair explosion (zipped-unnest over
# the symbol list), integer pair counts, total-order argmax, one
# replace() application feeding round r+1.
def _bpe_round_sql(r: int) -> str:
    prev = f"w{r - 1}"
    return f"""
        p{r} AS (SELECT string_split(trim(s, '|'), '|') AS ts, f FROM {prev}),
        e{r} AS (SELECT list_extract(ts, i) AS lft, list_extract(ts, i+1) AS rgt, f
                 FROM (SELECT ts, f, unnest(range(1, len(ts))) AS i FROM p{r})),
        c{r} AS (SELECT lft, rgt, CAST(sum(f) AS BIGINT) AS cnt
                 FROM e{r} GROUP BY lft, rgt),
        b{r} AS (SELECT lft, rgt, cnt FROM c{r} ORDER BY cnt DESC, lft, rgt LIMIT 1),
        w{r} AS (SELECT replace(s, '|'||b.lft||'|'||b.rgt||'|',
                                   '|'||b.lft||b.rgt||'|') AS s, f
                 FROM {prev} CROSS JOIN b{r} b)"""


_BPE_LEARNER_CTES = (
    r"""WITH toks AS (SELECT doc_id,
                      unnest(string_split(lower(text), ' ')) AS w FROM documents),
        wf AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM toks
               WHERE regexp_matches(w, '^[a-z0-9]+$') GROUP BY w),
        w0 AS (SELECT '|' || regexp_replace(w, '(.)', '\1|', 'g') AS s, f FROM wf),"""
    + ",".join(_bpe_round_sql(r) for r in range(1, 7))
)

_BPE_LEARN_SQL = (
    _BPE_LEARNER_CTES
    + "\n        "
    + " UNION ALL ".join(
        f"SELECT {r} AS round, lft, rgt, lft||rgt AS merged, cnt AS pair_count FROM b{r}"
        for r in range(1, 7)
    )
    + " ORDER BY round"
)

_BPE_ENCODE_SQL = (
    _BPE_LEARNER_CTES
    + r""",
        dt0 AS (SELECT doc_id, '|' || regexp_replace(w, '(.)', '\1|', 'g') AS s
                FROM toks WHERE regexp_matches(w, '^[a-z0-9]+$')),"""
    + ",".join(
        f"""
        dt{r} AS (SELECT doc_id, replace(s, '|'||b.lft||'|'||b.rgt||'|',
                                            '|'||b.lft||b.rgt||'|') AS s
                  FROM dt{r - 1} CROSS JOIN b{r} b)"""
        for r in range(1, 7)
    )
    + """,
        enc AS (SELECT doc_id,
                       CAST(sum(length(s) - length(replace(s, '|', '')) - 1)
                            AS BIGINT) AS n_bpe_tokens
                FROM dt6 GROUP BY doc_id)
        SELECT d.doc_id, coalesce(e.n_bpe_tokens, 0) AS n_bpe_tokens
        FROM documents d LEFT JOIN enc e USING (doc_id)"""
)

ORACLE_SQL = {
    "bpe_learn": _BPE_LEARN_SQL,
    "bpe_encode_counts": _BPE_ENCODE_SQL,
    "zorder_box_scan": """
        SELECT event_id, user_id, value FROM events
        WHERE user_id >= 2 AND value >= 50 AND value < 60
    """,
    "cdc_demux_routing": """
        SELECT event_id, user_id, value, event_type FROM events
        WHERE event_type = 'purchase'
    """,
    "events_profile": """
        SELECT 'event_id' AS column, count(*) AS n_rows,
               CAST(count(*) - count(event_id) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT event_id) AS BIGINT) AS ndv,
               CAST(min(event_id) AS VARCHAR) AS min_str,
               CAST(max(event_id) AS VARCHAR) AS max_str FROM events
        UNION ALL
        SELECT 'user_id', count(*),
               CAST(count(*) - count(user_id) AS BIGINT),
               CAST(count(DISTINCT user_id) AS BIGINT),
               CAST(min(user_id) AS VARCHAR),
               CAST(max(user_id) AS VARCHAR) FROM events
        UNION ALL
        SELECT 'event_type', count(*),
               CAST(count(*) - count(event_type) AS BIGINT),
               CAST(count(DISTINCT event_type) AS BIGINT),
               min(event_type), max(event_type) FROM events
        UNION ALL
        SELECT 'value', count(*),
               CAST(count(*) - count(value) AS BIGINT),
               CAST(count(DISTINCT value) AS BIGINT),
               CAST(CAST(floor(min(value)*1000+0.5) AS BIGINT) AS VARCHAR),
               CAST(CAST(floor(max(value)*1000+0.5) AS BIGINT) AS VARCHAR)
        FROM events
        UNION ALL
        SELECT 'ts', count(*),
               CAST(count(*) - count(ts) AS BIGINT),
               CAST(count(DISTINCT ts) AS BIGINT),
               strftime(min(ts), '%Y-%m-%d %H:%M:%S'),
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') FROM events
    """,
    # exact-rerank PQ search: output contract identical to brute force
    "ann_pq_verified": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                   FROM embeddings WHERE vec_id < 3),
        s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(e.embedding, q.qe) AS sim
              FROM embeddings e CROSS JOIN q),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, neighbor_id) AS rank
              FROM s)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 10
    """,
    "cdc_lww_upsert": """
        WITH tagged AS (
          SELECT *, CASE WHEN event_id % 10 < 6 THEN 'I'
                         WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY event_id DESC) AS rn
          FROM tagged)
        SELECT user_id, event_type, event_id AS last_event_id, value
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    # order-free state digest: poly/mix64 HUGEINT replicas of the
    # engine's buffer-level row hash, summed mod 2^64 per logical group —
    # commutative, so partitioning/order never matter
    "lake_state_digest": """
        WITH RECURSIVE pw(k, v) AS (
          SELECT 0, CAST(1 AS HUGEINT)
          UNION ALL SELECT k+1, (v * 1099511628211) % 18446744073709551616
          FROM pw WHERE k < 80
        ),
        src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src),
        state AS (SELECT conv_id, turn_idx, text
                  FROM ranked WHERE rn = 1 AND op <> 'D'),
        rows_s AS (SELECT conv_id,
                          conv_id || chr(31) || CAST(turn_idx AS VARCHAR)
                                  || chr(31) || coalesce(text, '') AS s
                   FROM state),
        cs AS (SELECT conv_id, s, length(s) AS L,
                      unnest(generate_series(1, length(s))) AS p
               FROM rows_s),
        ph AS (SELECT any_value(conv_id) AS conv_id, s,
                      (sum(CAST(ord(substr(s, CAST(p AS INTEGER), 1)) AS HUGEINT)
                           * pw.v) + any_value(L)) % 18446744073709551616 AS u
               FROM cs JOIN pw ON pw.k = cs.L - cs.p + 1
               GROUP BY s),
        cc AS (SELECT DISTINCT conv_id FROM state),
        cs2 AS (SELECT conv_id, length(conv_id) AS L,
                       unnest(generate_series(1, length(conv_id))) AS p
                FROM cc),
        pc2 AS (SELECT conv_id,
                       (sum(CAST(ord(substr(conv_id, CAST(p AS INTEGER), 1)) AS HUGEINT)
                            * pw.v) + any_value(L)) % 18446744073709551616 AS uc
                FROM cs2 JOIN pw ON pw.k = cs2.L - cs2.p + 1
                GROUP BY conv_id),
        hs AS (SELECT (
          SELECT CASE WHEN x2 < 0 THEN x2 + 18446744073709551616 ELSE x2 END
          FROM (SELECT CAST(xor(CAST(CASE WHEN v2 >= 9223372036854775808 THEN v2 - 18446744073709551616 ELSE v2 END AS BIGINT),
                                CAST(CASE WHEN v2 // 8589934592 >= 9223372036854775808 THEN v2 // 8589934592 - 18446744073709551616 ELSE v2 // 8589934592 END AS BIGINT)) AS HUGEINT) AS x2
                FROM (SELECT ((x1 % 4294967296) * 3981806797
                            + (((x1 % 4294967296) * 4283543511
                                + (x1 // 4294967296) * 3981806797) % 4294967296)
                              * 4294967296) % 18446744073709551616 AS v2
                      FROM (SELECT CASE WHEN x0 < 0 THEN x0 + 18446744073709551616 ELSE x0 END AS x1
                            FROM (SELECT CAST(xor(CAST(CASE WHEN ph.u >= 9223372036854775808 THEN ph.u - 18446744073709551616 ELSE ph.u END AS BIGINT),
                                                  CAST(ph.u // 8589934592 AS BIGINT)) AS HUGEINT) AS x0) ) ) ) ) AS h,
                      CAST((
          SELECT CASE WHEN x2 < 0 THEN x2 + 18446744073709551616 ELSE x2 END
          FROM (SELECT CAST(xor(CAST(CASE WHEN v2 >= 9223372036854775808 THEN v2 - 18446744073709551616 ELSE v2 END AS BIGINT),
                                CAST(CASE WHEN v2 // 8589934592 >= 9223372036854775808 THEN v2 // 8589934592 - 18446744073709551616 ELSE v2 // 8589934592 END AS BIGINT)) AS HUGEINT) AS x2
                FROM (SELECT ((x1 % 4294967296) * 3981806797
                            + (((x1 % 4294967296) * 4283543511
                                + (x1 // 4294967296) * 3981806797) % 4294967296)
                              * 4294967296) % 18446744073709551616 AS v2
                      FROM (SELECT CASE WHEN x0 < 0 THEN x0 + 18446744073709551616 ELSE x0 END AS x1
                            FROM (SELECT CAST(xor(CAST(CASE WHEN pc2.uc >= 9223372036854775808 THEN pc2.uc - 18446744073709551616 ELSE pc2.uc END AS BIGINT),
                                                  CAST(pc2.uc // 8589934592 AS BIGINT)) AS HUGEINT) AS x0) ) ) ) ) % 8 AS BIGINT) AS pid
               FROM ph JOIN pc2 USING (conv_id))
        SELECT pid, CAST(count(*) AS BIGINT) AS n_rows,
               CAST((sum(h // 4294967296) * 4294967296
                     + sum(h % 4294967296)) % 18446744073709551616 AS VARCHAR) AS digest
        FROM hs GROUP BY pid
    """,
    "transcript_cdc_replay": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text,
                 CASE WHEN event_id % 5 = 0 THEN 'search'
                      WHEN event_id % 5 = 1 THEN 'python' ELSE NULL END AS tool,
                 ts
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src)
        SELECT conv_id, turn_idx, role, text, tool,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, seq
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    "conversation_summary_view": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 ts
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src),
        live AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(max(seq) AS BIGINT) AS last_seq,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts_str
        FROM live GROUP BY conv_id
    """,
    # multi-version mode: the FULL derived change log survives — every op
    # (deletes included, payload-masked like the engine's tombstones)
    "cdc_changelog_export": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text,
                 CASE WHEN event_id % 5 = 0 THEN 'search'
                      WHEN event_id % 5 = 1 THEN 'python' ELSE NULL END AS tool,
                 ts
          FROM events)
        SELECT conv_id, turn_idx, op,
               CASE WHEN op = 'D' THEN NULL ELSE role END AS role,
               CASE WHEN op = 'D' THEN NULL ELSE text END AS text,
               CASE WHEN op = 'D' THEN NULL ELSE tool END AS tool,
               CASE WHEN op = 'D' THEN NULL
                    ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS ts_str,
               seq
        FROM src
    """,
    "snapshot_cdc_orders": """
        WITH old AS (
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 11 <> 0),
        new AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 13 <> 0),
        j AS (
          SELECT coalesce(n.o_orderkey, o.o_orderkey) AS k,
                 n.o_orderkey AS nk, o.o_orderkey AS ok,
                 n.o_orderstatus AS ns, n.o_totalprice AS nt,
                 o.o_orderstatus AS os, o.o_totalprice AS ot
          FROM new n FULL OUTER JOIN old o ON n.o_orderkey = o.o_orderkey)
        SELECT k AS o_orderkey,
               CASE WHEN nk IS NULL THEN NULL ELSE ns END AS o_orderstatus,
               CASE WHEN nk IS NULL THEN NULL ELSE nt END AS o_totalprice,
               CASE WHEN ok IS NULL THEN 'I'
                    WHEN nk IS NULL THEN 'D' ELSE 'U' END AS op
        FROM j
        WHERE ok IS NULL OR nk IS NULL
           OR (ns IS DISTINCT FROM os OR nt IS DISTINCT FROM ot)
    """,
    "scd2_transcripts": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text
          FROM events),
        led AS (
          SELECT *, lead(seq) OVER (PARTITION BY conv_id, turn_idx
                                    ORDER BY seq) AS valid_to_seq
          FROM src)
        SELECT conv_id, turn_idx,
               CASE WHEN op = 'D' THEN NULL ELSE role END AS role,
               CASE WHEN op = 'D' THEN NULL ELSE text END AS text,
               seq AS valid_from_seq, valid_to_seq,
               valid_to_seq IS NULL AS is_current
        FROM led WHERE op <> 'D'
    """,
    # FIXTURES F4 drift reproduced in SQL: segments are 1000-row slices in
    # event_id order; the first max(1, floor(0.4*n_segs)) segments carry no
    # tool column, so the winner's tool is NULL exactly there
    "schema_evolution_replay": """
        WITH n AS (SELECT count(*) AS n,
                          CAST(ceil(count(*) / 1000.0) AS BIGINT) AS n_segs
                   FROM events),
        cutoff AS (SELECT greatest(1, CAST(floor(n_segs * 0.4) AS BIGINT))
                          * 1000 AS rows_no_tool FROM n),
        src AS (
          SELECT event_id AS seq,
                 row_number() OVER (ORDER BY event_id) AS rnk,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text,
                 CASE WHEN event_id % 5 = 0 THEN 'search'
                      WHEN event_id % 5 = 1 THEN 'python' ELSE NULL END AS tool,
                 ts
          FROM events),
        src2 AS (
          SELECT seq, op, conv_id, turn_idx, role, text,
                 CASE WHEN rnk <= (SELECT rows_no_tool FROM cutoff)
                      THEN NULL ELSE tool END AS tool,
                 ts
          FROM src),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src2)
        SELECT conv_id, turn_idx, role, text, tool,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, seq
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    "lake_time_travel": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text,
                 CASE WHEN event_id % 5 = 0 THEN 'search'
                      WHEN event_id % 5 = 1 THEN 'python' ELSE NULL END AS tool,
                 ts
          FROM events
          WHERE event_id <= (SELECT max(event_id) // 2 FROM events)),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src)
        SELECT conv_id, turn_idx, role, text, tool,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, seq
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    "transcript_window_replay": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' w' || CAST(event_id AS VARCHAR) AS text
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src)
        SELECT conv_id, turn_idx, role, text, seq
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
               floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base_price,
               floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS sum_disc_price,
               count(l_quantity) AS count_order,
               floor(sum(l_quantity) / count(l_quantity) * 10000 + 0.5) / 10000 AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "customers_per_region": """
        SELECT r.r_name,
               count(c.c_custkey) AS n_customers,
               floor(sum(c.c_acctbal) * 100 + 0.5) / 100 AS sum_acctbal,
               floor(sum(c.c_acctbal) / count(c.c_custkey) * 10000 + 0.5) / 10000 AS avg_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    "projection_filter_revenue": """
        SELECT l_orderkey, l_linenumber, l_quantity,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
    "semi_join_fulfilled": """
        SELECT l_returnflag, count(l_quantity) AS n_items,
               floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        GROUP BY l_returnflag
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    "events_partitioned_roundtrip": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               count(value) AS n_events,
               floor(sum(value) * 100 + 0.5) / 100 AS sum_value
        FROM events WHERE event_type = 'click'
        GROUP BY strftime(ts, '%Y-%m-%d')
    """,
    "sql_split_read": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_totalprice > 150000
    """,
    # token slices partition the table: their union IS the filtered scan
    "sql_token_read": """
        SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        FROM customer WHERE c_acctbal > 1000
    """,
    "key_range_scan": """
        SELECT user_id, event_id AS last_event_id, event_type, value
        FROM events
        WHERE user_id >= 2 AND user_id < 12
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY event_id DESC) = 1
    """,
    # skip scan: OR of disjoint key ranges, latest version per key
    "key_skip_scan": """
        SELECT user_id, event_id AS last_event_id, event_type, value
        FROM events
        WHERE (user_id >= 2 AND user_id < 5)
           OR (user_id >= 20 AND user_id < 23)
           OR (user_id >= 9 AND user_id < 12)
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY event_id DESC) = 1
    """,
    # per-interval tsdb slices partition the window: union == filtered scan
    "tsdb_window_read": """
        SELECT event_id, event_type, ts, value FROM events
        WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
          AND ts <  TIMESTAMP '2024-01-05 00:00:00'
          AND event_type IN ('click', 'view')
    """,
    # sample-quantile slices partition the table: union == filtered scan
    "sql_sample_read": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer WHERE c_acctbal < 9000
    """,
    # non-overlapping substring counts: the replace trick counts exactly
    # what pc.count_substring counts; (score DESC, doc_id ASC) is total
    "search_topk_scroll": """
        SELECT doc_id,
               CAST((length(text) - length(replace(text, 'merge', ''))) / 5
                  + (length(text) - length(replace(text, 'window', ''))) / 6
                  AS BIGINT) AS score
        FROM documents
        WHERE (length(text) - length(replace(text, 'merge', ''))) / 5
            + (length(text) - length(replace(text, 'window', ''))) / 6 > 0
        ORDER BY score DESC, doc_id
        LIMIT 20
    """,
    # post-upsert table state recomputed from the source: rows whose key
    # got a conflicting delta carry the updated value (ON DUPLICATE KEY)
    "sql_writer_roundtrip": """
        SELECT doc_id, lang, source,
               CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000
                    ELSE n_chars END AS n_chars
        FROM documents
    """,
    "distinct_event_types": "SELECT DISTINCT event_type FROM events",
    "transform_chain": """
        SELECT c_custkey, upper(substr(c_name, 1, 8)) AS name8,
               lpad(substr(c_mktsegment, 1, 12), 12, '*') AS seg_pad,
               substr(c_mktsegment, 1, 2) || 'XX' || substr(c_mktsegment, 6) AS seg_repl,
               c_acctbal
        FROM customer WHERE c_acctbal IS NULL OR NOT (c_acctbal > 5000)
    """,
    "url_extract": """
        WITH u AS (
          SELECT p_partkey,
                 'https://parts.example.com/' || replace(p_brand, '#', '-') || '/'
                   || CAST(p_partkey AS VARCHAR) || '?size=' || CAST(p_size AS VARCHAR) AS url
          FROM part)
        SELECT p_partkey,
               split_part(url, '/', 3) AS url_host,
               regexp_extract(url, '^[a-z]+://[^/]+([^?#]*)', 1) AS url_path,
               regexp_extract(url, '[?&]size=([^&#]*)', 1) AS url_size
        FROM u
    """,
    "filter_like": """
        SELECT p_partkey, p_type, p_brand FROM part
        WHERE NOT regexp_full_match(p_type, '.*ECO.*')
    """,
    "cast_roundtrip": """
        SELECT event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
               strftime(ts, '%Y-%m-%d') AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
        FROM events
    """,
    "token_stats": """
        SELECT doc_id, length(text) AS n_chars_calc,
               len(regexp_extract_all(text, '\\S+')) AS n_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS n_bpe_tokens
        FROM documents
    """,
    "quality_ratios": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                 / greatest(length(text), 1) AS punct_ratio,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                 / greatest(length(text), 1) AS digit_ratio
        FROM documents
    """,
    "fingerprint": "SELECT doc_id, md5(text) AS fp_md5 FROM documents",
    "text_normalize": r"""
        SELECT doc_id,
               nfc_normalize(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm,
               CAST(length(nfc_normalize(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS BIGINT) AS n_chars_norm
        FROM documents
    """,
    "pii_redact": r"""
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(
                 text || ' reach user' || CAST(doc_id AS VARCHAR)
                      || '@example.com or 10.2.' || CAST(doc_id % 250 AS VARCHAR)
                      || '.99 call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                 '\+\d[\d-]{7,}\d', '<PHONE>', 'g') AS redacted
        FROM documents
    """,
    "token_positions": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
        SELECT doc_id, unnest(range(1, len(ts)+1)) AS pos, unnest(ts) AS tok
        FROM toks
    """,
    "doc_repetition": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        counts AS (
          SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok)
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tok,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(max(c) AS BIGINT) AS top_count,
               CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_frac,
               CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS distinct_frac
        FROM counts GROUP BY doc_id
    """,
    "decontaminate_3gram": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        pos AS (SELECT doc_id, unnest(range(1, greatest(len(ts)-2, 0)+1)) AS i FROM toks),
        ngr AS (
          SELECT p.doc_id, array_to_string(list_slice(t.ts, p.i, p.i+2), ' ') AS ng
          FROM pos p JOIN toks t ON p.doc_id = t.doc_id),
        bench AS (SELECT DISTINCT ng FROM ngr WHERE doc_id % 13 = 0),
        train AS (SELECT DISTINCT doc_id, ng FROM ngr WHERE doc_id % 13 <> 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM train WHERE ng IN (SELECT ng FROM bench)
        GROUP BY doc_id
    """,
    # CCNet-style unigram LM scoring: per-token log-probs snap to int64
    # micros BEFORE summation (floor(ln·1e6 + 0.5)), so per-doc totals are
    # associative integer sums — ln over one IEEE division is the
    # tfidf-proven cross-engine-exact expression.
    "docs_lm_perplexity": """
        WITH rt AS (
          SELECT term FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS term
            FROM documents WHERE lang = 'en')
          WHERE term <> ''),
        vocab AS (SELECT term, count(*) AS c FROM rt GROUP BY term),
        nv AS (SELECT (SELECT count(*) FROM rt)
                    + (SELECT count(*) FROM vocab) AS denom),
        t2 AS (
          SELECT doc_id, term FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> ''),
        scored AS (
          SELECT t2.doc_id,
                 CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov,
                 CAST(floor(ln(CAST(coalesce(v.c, 0) + 1 AS DOUBLE)
                               / CAST(nv.denom AS DOUBLE))
                            * 1000000.0 + 0.5) AS BIGINT) AS lp
          FROM t2 LEFT JOIN vocab v USING (term) CROSS JOIN nv),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(oov) AS BIGINT) AS n_oov,
                 CAST(sum(lp) AS BIGINT) AS logp_micro
          FROM scored GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(a.n_tokens, 0) AS n_tokens,
               coalesce(a.n_oov, 0) AS n_oov,
               coalesce(a.logp_micro, 0) AS logp_micro
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    # mixture sampling: rates derived from per-stratum counts with pure
    # integer arithmetic (floor division), then the stratified keep rule —
    # membership reproduces exactly
    "events_mixture_sample": """
        WITH n AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type),
        r AS (SELECT event_type,
                     least(1000000, greatest(1, (1000000 * 2000) // n)) AS rate
              FROM n)
        SELECT e.event_id, e.user_id, e.event_type
        FROM events e JOIN r USING (event_type)
        WHERE ((e.event_id % 1000003) * 2654435761) % 1000000 < r.rate
    """,
    "events_exact_sample": """
        WITH u0 AS (SELECT event_id, user_id, event_type, CAST(event_id AS HUGEINT) AS u FROM events),
        x1 AS (SELECT * EXCLUDE (u), CAST(xor(CAST(u AS BIGINT), CAST(u // 8589934592 AS BIGINT)) AS HUGEINT) AS x FROM u0),
        x1u AS (SELECT * EXCLUDE (x), CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS x FROM x1),
        m AS (SELECT * EXCLUDE (x), ((x % 4294967296) * 3981806797
                    + (((x % 4294967296) * 4283543511
                        + (x // 4294967296) * 3981806797) % 4294967296)
                      * 4294967296) % 18446744073709551616 AS v FROM x1u),
        ms AS (SELECT * EXCLUDE (v), CASE WHEN v >= 9223372036854775808
                              THEN v - 18446744073709551616 ELSE v END AS s,
                      v // 8589934592 AS hi FROM m),
        h2 AS (SELECT * EXCLUDE (s, hi), CAST(xor(CAST(s AS BIGINT),
                               CAST(CASE WHEN hi >= 9223372036854775808
                                         THEN hi - 18446744073709551616
                                         ELSE hi END AS BIGINT)) AS HUGEINT) AS x
               FROM ms),
        hu AS (SELECT * EXCLUDE (x),
                      CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS h FROM h2),
        ranked AS (SELECT event_id, user_id, event_type,
                          row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
                   FROM hu)
        SELECT event_id, user_id, event_type FROM ranked WHERE rn <= 150
    """,
    "events_leakage_split": """
        WITH u0 AS (SELECT event_id, event_type, CAST(user_id AS HUGEINT) AS u FROM events),
        x1 AS (SELECT event_id, event_type, CAST(xor(CAST(u AS BIGINT), CAST(u // 8589934592 AS BIGINT)) AS HUGEINT) AS x FROM u0),
        x1u AS (SELECT event_id, event_type, CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS x FROM x1),
        m AS (SELECT event_id, event_type, ((x % 4294967296) * 3981806797
                    + (((x % 4294967296) * 4283543511
                        + (x // 4294967296) * 3981806797) % 4294967296)
                      * 4294967296) % 18446744073709551616 AS v FROM x1u),
        ms AS (SELECT event_id, event_type, CASE WHEN v >= 9223372036854775808
                              THEN v - 18446744073709551616 ELSE v END AS s,
                      v // 8589934592 AS hi FROM m),
        h2 AS (SELECT event_id, event_type, CAST(xor(CAST(s AS BIGINT),
                               CAST(CASE WHEN hi >= 9223372036854775808
                                         THEN hi - 18446744073709551616
                                         ELSE hi END AS BIGINT)) AS HUGEINT) AS x
               FROM ms),
        hu AS (SELECT event_id, event_type,
                      CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS h FROM h2)
        SELECT CASE WHEN h % 1000 < 100 THEN 'val' ELSE 'train' END AS split,
               event_type, CAST(count(*) AS BIGINT) AS n_rows
        FROM hu GROUP BY 1, 2
    """,
    # mix64 (partition.hash_ints) replicated in HUGEINT arithmetic:
    # logical >>33 = // 2^33, xor through BIGINT two's complement, the
    # 64x64 multiply mod 2^64 via 32-bit split.  Nonnegative keys only.
    "events_shuffle_export": """
        WITH u0 AS (SELECT CAST(event_id AS HUGEINT) AS u FROM events),
        x1 AS (SELECT CAST(xor(CAST(u AS BIGINT), CAST(u // 8589934592 AS BIGINT)) AS HUGEINT) AS x FROM u0),
        x1u AS (SELECT CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS x FROM x1),
        m AS (SELECT ((x % 4294967296) * 3981806797
                    + (((x % 4294967296) * 4283543511
                        + (x // 4294967296) * 3981806797) % 4294967296)
                      * 4294967296) % 18446744073709551616 AS v FROM x1u),
        ms AS (SELECT CASE WHEN v >= 9223372036854775808
                           THEN v - 18446744073709551616 ELSE v END AS s,
                      v // 8589934592 AS hi FROM m),
        h2 AS (SELECT CAST(xor(CAST(s AS BIGINT),
                               CAST(CASE WHEN hi >= 9223372036854775808
                                         THEN hi - 18446744073709551616
                                         ELSE hi END AS BIGINT)) AS HUGEINT) AS x
               FROM ms),
        hu AS (SELECT CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS h FROM h2)
        SELECT CAST(h // 576460752303423488 AS BIGINT) AS shard,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(h) AS VARCHAR) AS min_h,
               CAST(max(h) AS VARCHAR) AS max_h
        FROM hu GROUP BY 1
    """,
    "inverted_index_terms": """
        WITH t2 AS (
          SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> '')
        SELECT term, CAST(count(*) AS BIGINT) AS df,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        FROM t2 GROUP BY term HAVING count(*) >= 20
    """,
    "index_and_search": """
        WITH t2 AS (
          SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> '')
        SELECT doc_id FROM t2 WHERE term IN ('query', 'window', 'merge')
        GROUP BY doc_id HAVING count(*) = 3
    """,
    "incremental_lm_perplexity": """
        WITH rt AS (
          SELECT term FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> ''),
        vocab AS (SELECT term, count(*) AS c FROM rt GROUP BY term),
        nv AS (SELECT (SELECT count(*) FROM rt)
                    + (SELECT count(*) FROM vocab) AS denom),
        t2 AS (
          SELECT doc_id, term FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> ''),
        scored AS (
          SELECT t2.doc_id,
                 CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov,
                 CAST(floor(ln(CAST(coalesce(v.c, 0) + 1 AS DOUBLE)
                               / CAST(nv.denom AS DOUBLE))
                            * 1000000.0 + 0.5) AS BIGINT) AS lp
          FROM t2 LEFT JOIN vocab v USING (term) CROSS JOIN nv),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(oov) AS BIGINT) AS n_oov,
                 CAST(sum(lp) AS BIGINT) AS logp_micro
          FROM scored GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(a.n_tokens, 0) AS n_tokens,
               coalesce(a.n_oov, 0) AS n_oov,
               coalesce(a.logp_micro, 0) AS logp_micro
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    "sequence_packing": """
        WITH c AS (
          SELECT doc_id, n_chars,
                 CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
          FROM documents)
        SELECT cum_before // 4096 AS seq_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM c GROUP BY seq_id
    """,
    # heuristic lang-id IS SQL-expressible: marker-hit ratios are divisions
    # of identical integers (bit-identical doubles in both engines), and the
    # CASE cascade reproduces numpy argmax's first-max tie-break over the
    # language order [en, de, fr, es, zh].
    "lang_id": """
        WITH h AS (
          SELECT doc_id,
                 greatest(len(regexp_extract_all(text, '\\S+')), 1) AS ntok,
                 greatest(length(text), 1) AS nchr,
                 len(regexp_extract_all(text,
                   '\\b(the|and|of|to|in|is|that|for|with|was)\\b')) AS h_en,
                 len(regexp_extract_all(text,
                   '\\b(der|die|das|und|ist|nicht|ein|mit|für|auf)\\b')) AS h_de,
                 len(regexp_extract_all(text,
                   '\\b(le|la|les|des|est|une|dans|pour|que|avec)\\b')) AS h_fr,
                 len(regexp_extract_all(text,
                   '\\b(el|los|las|una|es|en|por|para|con|del)\\b')) AS h_es,
                 len(regexp_extract_all(text, '[一-鿿]')) AS h_zh
          FROM documents),
        sc AS (
          SELECT doc_id,
                 CAST(h_en AS DOUBLE) / ntok AS s_en,
                 CAST(h_de AS DOUBLE) / ntok AS s_de,
                 CAST(h_fr AS DOUBLE) / ntok AS s_fr,
                 CAST(h_es AS DOUBLE) / ntok AS s_es,
                 CAST(h_zh AS DOUBLE) / nchr AS s_zh
          FROM h)
        SELECT doc_id,
               CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN NULL
                    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
                         AND s_en >= s_zh THEN 'en'
                    WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
                    WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
                    WHEN s_es >= s_zh THEN 'es'
                    ELSE 'zh' END AS lang_pred
        FROM sc
    """,
    "dedup_exact_prefix": """
        SELECT min(doc_id) AS doc_id, count(doc_id) AS n_copies
        FROM documents GROUP BY substr(lower(text), 1, 20)
    """,
    # fuzzy join == ALL cross-side pairs at exact 5-gram Jaccard >= 0.5
    # (certifies LSH blocking recall at gate scale, precision always)
    "similarity_join_docs": """
        WITH idx AS (
          SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text) - 4, 0))) AS i
          FROM documents),
        g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS gram FROM idx),
        sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS ni
          FROM g ga JOIN g gb ON ga.gram = gb.gram
          WHERE ga.doc_id % 2 = 0 AND gb.doc_id % 2 = 1
          GROUP BY 1, 2)
        SELECT i.a, i.b,
               CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.a
        JOIN sizes sb ON sb.doc_id = i.b
        WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.5
    """,
    # SFT example assembly over the derived live transcripts: context =
    # budget-truncated suffix of preceding "role: text" lines (DESC window
    # cumsum <= 200 joined chars), target = the assistant turn's text
    "sft_context_assembly": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src),
        live AS (SELECT conv_id, turn_idx, role, text
                 FROM ranked WHERE rn = 1 AND op <> 'D'),
        lines AS (SELECT conv_id, turn_idx, role || ': ' || text AS line
                  FROM live),
        pairs AS (
          SELECT t.conv_id, t.turn_idx AS tgt, l.turn_idx AS src_turn,
                 l.line, length(l.line) AS ln
          FROM live t JOIN lines l
            ON l.conv_id = t.conv_id AND l.turn_idx < t.turn_idx
          WHERE t.role = 'assistant'),
        win AS (
          SELECT *, sum(ln + 1) OVER (PARTITION BY conv_id, tgt
                                      ORDER BY src_turn DESC) - 1 AS cost
          FROM pairs),
        ctx AS (SELECT conv_id, tgt,
                       string_agg(line, chr(10) ORDER BY src_turn) AS context,
                       CAST(count(*) AS BIGINT) AS n_context
                FROM win WHERE cost <= 200 GROUP BY conv_id, tgt)
        SELECT t.conv_id, t.turn_idx, coalesce(c.context, '') AS context,
               t.text AS target,
               coalesce(c.n_context, 0) AS n_context
        FROM live t LEFT JOIN ctx c
          ON c.conv_id = t.conv_id AND c.tgt = t.turn_idx
        WHERE t.role = 'assistant'
    """,
    # bloom-pruned equality scan == full scan (the exact filter removes
    # bloom false positives; pruning only changes I/O)
    "bloom_skip_scan": """
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents WHERE lang = 'fr' GROUP BY source
    """,
    # exact substring dedup: hot 8-grams (>=2 occurrences, >=2 docs) ->
    # DISTINCT covered positions -> anti-join tokens -> string_agg rebuild
    "dedup_span_exact": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        pos AS (SELECT doc_id, unnest(range(1, greatest(len(ts)-7, 0)+1)) AS i FROM toks),
        ngr AS (SELECT p.doc_id, p.i,
                       array_to_string(list_slice(t.ts, p.i, p.i+7), ' ') AS ng
                FROM pos p JOIN toks t USING (doc_id)),
        hot AS (SELECT ng FROM ngr GROUP BY ng
                HAVING count(*) >= 2 AND count(DISTINCT doc_id) >= 2),
        cov AS (SELECT DISTINCT g.doc_id, g.i + o.o AS p
                FROM ngr g JOIN hot USING (ng)
                CROSS JOIN (SELECT unnest(range(0, 8)) AS o) o),
        tp AS (SELECT doc_id, unnest(range(1, len(ts)+1)) AS p FROM toks),
        tk AS (SELECT tp.doc_id, tp.p, t.ts[CAST(tp.p AS INTEGER)] AS tok
               FROM tp JOIN toks t USING (doc_id)),
        surv AS (SELECT tk.doc_id,
                        string_agg(tk.tok, ' ' ORDER BY tk.p) AS text_clean,
                        count(*) AS n_kept
                 FROM tk ANTI JOIN cov ON tk.doc_id = cov.doc_id AND tk.p = cov.p
                 GROUP BY tk.doc_id)
        SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens,
               CAST(len(t.ts) - coalesce(s.n_kept, 0) AS BIGINT) AS n_removed,
               coalesce(s.text_clean, '') AS text_clean
        FROM toks t LEFT JOIN surv s USING (doc_id)
    """,
    # unrolled Lloyd's rounds (the bpe_learn discipline): centroids are
    # micro-snapped between rounds in BOTH engines, so assignments agree
    "embedding_kmeans": """
        WITH e AS (
          SELECT vec_id, unnest(range(1, len(embedding)+1)) AS pos,
                 CAST(unnest(embedding) AS DOUBLE) AS comp
          FROM embeddings),
        c0 AS (
          SELECT r - 1 AS c, pos,
                 floor(comp * 1000000 + 0.5) / 1000000 AS comp
          FROM (SELECT dense_rank() OVER (ORDER BY vec_id) AS r, pos, comp
                FROM e WHERE vec_id IN (SELECT vec_id FROM embeddings
                                        ORDER BY vec_id LIMIT 4))),
        d1 AS (
          SELECT e.vec_id, c.c,
                 sum(CAST(floor((e.comp - c.comp) * (e.comp - c.comp)
                                * 1000000 + 0.5) AS BIGINT)) AS dist
          FROM e JOIN c0 c ON e.pos = c.pos
          GROUP BY e.vec_id, c.c),
        a1 AS (
          SELECT vec_id, c FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dist, c) AS rn
            FROM d1)
          WHERE rn = 1),
        cnt1 AS (SELECT c, count(*) AS n FROM a1 GROUP BY c),
        c1 AS (
          SELECT a.c, e.pos,
                 floor(sum(CAST(floor(e.comp * 1000000 + 0.5) AS BIGINT))
                       / count(*) + 0.5) / 1000000 AS comp
          FROM e JOIN a1 a USING (vec_id)
          GROUP BY a.c, e.pos),
        d2 AS (
          SELECT e.vec_id, c.c,
                 sum(CAST(floor((e.comp - c.comp) * (e.comp - c.comp)
                                * 1000000 + 0.5) AS BIGINT)) AS dist
          FROM e JOIN c1 c ON e.pos = c.pos
          GROUP BY e.vec_id, c.c),
        a2 AS (
          SELECT vec_id, c FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dist, c) AS rn
            FROM d2)
          WHERE rn = 1),
        cnt2 AS (SELECT c, count(*) AS n FROM a2 GROUP BY c),
        c2 AS (
          SELECT a.c, e.pos,
                 floor(sum(CAST(floor(e.comp * 1000000 + 0.5) AS BIGINT))
                       / count(*) + 0.5) / 1000000 AS comp
          FROM e JOIN a2 a USING (vec_id)
          GROUP BY a.c, e.pos)
        SELECT c2.c AS cluster, c2.pos,
               CAST(floor(c2.comp * 1000000 + 0.5) AS BIGINT) AS comp_micro,
               CAST(cnt2.n AS BIGINT) AS n
        FROM c2 JOIN cnt2 USING (c)
    """,
    "semantic_dedup_vecs": """
        WITH dropped AS (
          SELECT DISTINCT b.vec_id AS v
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35)
        SELECT vec_id FROM embeddings
        WHERE vec_id NOT IN (SELECT v FROM dropped)
    """,
    "ngram_containment_docs": """
        WITH pairs AS (
          SELECT d.doc_id AS a, d.doc_id + 1 AS b
          FROM documents d
          WHERE d.doc_id % 25 = 0
            AND EXISTS (SELECT 1 FROM documents e WHERE e.doc_id = d.doc_id + 1)),
        need AS (SELECT a AS x FROM pairs UNION SELECT b FROM pairs),
        idx AS (
          SELECT d.doc_id, d.text,
                 unnest(generate_series(1, greatest(length(d.text) - 4, 0))) AS i
          FROM documents d JOIN need ON d.doc_id = need.x),
        g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS gram FROM idx),
        sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT p.a, p.b, count(*) AS ni
          FROM pairs p
          JOIN g ga ON ga.doc_id = p.a
          JOIN g gb ON gb.doc_id = p.b AND gb.gram = ga.gram
          GROUP BY p.a, p.b)
        SELECT p.a, p.b,
               CASE WHEN coalesce(sa.n, 0) = 0 THEN 0.0
                    ELSE CAST(coalesce(i.ni, 0) AS DOUBLE) / sa.n END AS contain_a,
               CASE WHEN coalesce(sb.n, 0) = 0 THEN 0.0
                    ELSE CAST(coalesce(i.ni, 0) AS DOUBLE) / sb.n END AS contain_b
        FROM pairs p
        LEFT JOIN sizes sa ON sa.doc_id = p.a
        LEFT JOIN sizes sb ON sb.doc_id = p.b
        LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
    """,
    "edit_distance_docs": """
        WITH pairs AS (
          SELECT d.doc_id AS a, d.doc_id + 1 AS b
          FROM documents d
          WHERE d.doc_id % 25 = 0
            AND EXISTS (SELECT 1 FROM documents e WHERE e.doc_id = d.doc_id + 1))
        SELECT p.a, p.b,
               CAST(levenshtein(coalesce(da.text, ''),
                                coalesce(db.text, '')) AS BIGINT) AS edit_dist
        FROM pairs p
        JOIN documents da ON da.doc_id = p.a
        JOIN documents db ON db.doc_id = p.b
    """,
    # the CMS sketch rebuilt in SQL: identical poly+mix64 hash chain,
    # identical slot arithmetic — estimates (collisions included) match
    "docs_cms_counts": """
        WITH RECURSIVE pw(k, v) AS (
          SELECT 0, CAST(1 AS HUGEINT)
          UNION ALL SELECT k+1, (v * 1099511628211) % 18446744073709551616
          FROM pw WHERE k < 80
        ),
        toks AS (
          SELECT term FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> ''),
        tf AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
        ap AS (SELECT term FROM tf
               UNION SELECT unnest(['query', 'window', 'merge', 'xyzzy'])),
        cs AS (SELECT term, length(term) AS L,
                      unnest(generate_series(1, length(term))) AS p
               FROM ap),
        ph AS (SELECT term,
                      (sum(CAST(ord(substr(term, CAST(p AS INTEGER), 1)) AS HUGEINT)
                           * pw.v) + any_value(L)) % 18446744073709551616 AS up
               FROM cs JOIN pw ON pw.k = cs.L - cs.p + 1
               GROUP BY term),
        hu AS (SELECT term, (
          SELECT CASE WHEN x2 < 0 THEN x2 + 18446744073709551616 ELSE x2 END
          FROM (SELECT CAST(xor(CAST(CASE WHEN v2 >= 9223372036854775808 THEN v2 - 18446744073709551616 ELSE v2 END AS BIGINT),
                                CAST(CASE WHEN v2 // 8589934592 >= 9223372036854775808 THEN v2 // 8589934592 - 18446744073709551616 ELSE v2 // 8589934592 END AS BIGINT)) AS HUGEINT) AS x2
                FROM (SELECT ((x1 % 4294967296) * 3981806797
                            + (((x1 % 4294967296) * 4283543511
                                + (x1 // 4294967296) * 3981806797) % 4294967296)
                              * 4294967296) % 18446744073709551616 AS v2
                      FROM (SELECT CASE WHEN x0 < 0 THEN x0 + 18446744073709551616 ELSE x0 END AS x1
                            FROM (SELECT CAST(xor(CAST(CASE WHEN ph.up >= 9223372036854775808 THEN ph.up - 18446744073709551616 ELSE ph.up END AS BIGINT),
                                                  CAST(ph.up // 8589934592 AS BIGINT)) AS HUGEINT) AS x0) ) ) ) ) AS u FROM ph),
        hs AS (SELECT term,
                      CAST((
          SELECT CASE WHEN x2 < 0 THEN x2 + 18446744073709551616 ELSE x2 END
          FROM (SELECT CAST(xor(CAST(CASE WHEN v2 >= 9223372036854775808 THEN v2 - 18446744073709551616 ELSE v2 END AS BIGINT),
                                CAST(CASE WHEN v2 // 8589934592 >= 9223372036854775808 THEN v2 // 8589934592 - 18446744073709551616 ELSE v2 // 8589934592 END AS BIGINT)) AS HUGEINT) AS x2
                FROM (SELECT ((x1 % 4294967296) * 3981806797
                            + (((x1 % 4294967296) * 4283543511
                                + (x1 // 4294967296) * 3981806797) % 4294967296)
                              * 4294967296) % 18446744073709551616 AS v2
                      FROM (SELECT CASE WHEN x0 < 0 THEN x0 + 18446744073709551616 ELSE x0 END AS x1
                            FROM (SELECT CAST(xor(CAST(CASE WHEN ((hu.u + 11400714819323198485) % 18446744073709551616) >= 9223372036854775808 THEN ((hu.u + 11400714819323198485) % 18446744073709551616) - 18446744073709551616 ELSE ((hu.u + 11400714819323198485) % 18446744073709551616) END AS BIGINT),
                                                  CAST(((hu.u + 11400714819323198485) % 18446744073709551616) // 8589934592 AS BIGINT)) AS HUGEINT) AS x0) ) ) ) ) % 1024 AS BIGINT) AS s0,
                      CAST((
          SELECT CASE WHEN x2 < 0 THEN x2 + 18446744073709551616 ELSE x2 END
          FROM (SELECT CAST(xor(CAST(CASE WHEN v2 >= 9223372036854775808 THEN v2 - 18446744073709551616 ELSE v2 END AS BIGINT),
                                CAST(CASE WHEN v2 // 8589934592 >= 9223372036854775808 THEN v2 // 8589934592 - 18446744073709551616 ELSE v2 // 8589934592 END AS BIGINT)) AS HUGEINT) AS x2
                FROM (SELECT ((x1 % 4294967296) * 3981806797
                            + (((x1 % 4294967296) * 4283543511
                                + (x1 // 4294967296) * 3981806797) % 4294967296)
                              * 4294967296) % 18446744073709551616 AS v2
                      FROM (SELECT CASE WHEN x0 < 0 THEN x0 + 18446744073709551616 ELSE x0 END AS x1
                            FROM (SELECT CAST(xor(CAST(CASE WHEN ((hu.u + 14029467366897019727) % 18446744073709551616) >= 9223372036854775808 THEN ((hu.u + 14029467366897019727) % 18446744073709551616) - 18446744073709551616 ELSE ((hu.u + 14029467366897019727) % 18446744073709551616) END AS BIGINT),
                                                  CAST(((hu.u + 14029467366897019727) % 18446744073709551616) // 8589934592 AS BIGINT)) AS HUGEINT) AS x0) ) ) ) ) % 1024 AS BIGINT) AS s1
               FROM hu),
        sk0 AS (SELECT hs.s0 AS slot, sum(tf.c) AS n
                FROM tf JOIN hs USING (term) GROUP BY hs.s0),
        sk1 AS (SELECT hs.s1 AS slot, sum(tf.c) AS n
                FROM tf JOIN hs USING (term) GROUP BY hs.s1)
        SELECT p.term,
               CAST(least(coalesce(k0.n, 0), coalesce(k1.n, 0)) AS BIGINT) AS est
        FROM (SELECT unnest(['query', 'window', 'merge', 'xyzzy']) AS term) p
        JOIN hs USING (term)
        LEFT JOIN sk0 k0 ON k0.slot = hs.s0
        LEFT JOIN sk1 k1 ON k1.slot = hs.s1
    """,
    "docs_pmi_collocations": """
        WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts
                      FROM documents),
        tp AS (SELECT doc_id, unnest(range(1, len(ts)+1)) AS pos,
                      unnest(ts) AS tok
               FROM toks),
        prs AS (
          SELECT least(x.tok, y.tok) AS a, greatest(x.tok, y.tok) AS b
          FROM tp x JOIN tp y ON x.doc_id = y.doc_id
                            AND y.pos - x.pos BETWEEN 1 AND 3
          WHERE x.tok <> '' AND y.tok <> ''),
        cab AS (SELECT a, b, count(*) AS c_ab FROM prs GROUP BY a, b),
        uni AS (SELECT tok AS term, count(*) AS c FROM tp
                WHERE tok <> '' GROUP BY tok),
        tt AS (SELECT CAST((SELECT count(*) FROM tp WHERE tok <> '') AS DOUBLE) AS t,
                      CAST((SELECT count(*) FROM prs) AS DOUBLE) AS p),
        scored AS (
          SELECT cab.a, cab.b, CAST(cab.c_ab AS BIGINT) AS c_ab,
                 CAST(floor(ln((CAST(cab.c_ab AS DOUBLE) * tt.t * tt.t)
                               / (tt.p * ua.c * ub.c))
                            * 1000000.0 + 0.5) AS BIGINT) AS pmi_micro
          FROM cab
          JOIN uni ua ON ua.term = cab.a
          JOIN uni ub ON ub.term = cab.b
          CROSS JOIN tt
          WHERE cab.c_ab >= 5),
        ranked AS (SELECT *, row_number() OVER (ORDER BY pmi_micro DESC,
                                                a ASC, b ASC) AS rank
                   FROM scored)
        SELECT a, b, c_ab, pmi_micro, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 20
    """,
    "docs_bm25_topk": """
        WITH toks AS (
          SELECT doc_id, term FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
          WHERE term <> ''),
        dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*) FROM dl) AS n,
                         CAST((SELECT count(*) FROM toks) AS DOUBLE)
                           / (SELECT count(*) FROM dl) AS avglen),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
               WHERE term IN ('query', 'window', 'merge')
               GROUP BY doc_id, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        contrib AS (
          SELECT tf.doc_id,
                 CAST(floor(
                   ln((CAST(s.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                      / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
                   * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                      / (CAST(tf.tf AS DOUBLE)
                         + 1.2 * (1.0 - 0.75
                                  + 0.75 * (CAST(dl.dl AS DOUBLE) / s.avglen))))
                   * 1000000.0 + 0.5) AS BIGINT) AS c
          FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
          CROSS JOIN stats s),
        scored AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micro
                   FROM contrib GROUP BY doc_id),
        ranked AS (SELECT *, row_number() OVER (ORDER BY score_micro DESC,
                                                doc_id ASC) AS rn
                   FROM scored)
        SELECT doc_id, score_micro FROM ranked WHERE rn <= 15
    """,
    "docs_phrase_search": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        tp AS (SELECT doc_id, unnest(range(1, len(ts)+1)) AS pos,
                      unnest(ts) AS tok
               FROM toks)
        SELECT DISTINCT a.doc_id
        FROM tp a JOIN tp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.tok = 'order' AND b.tok = 'fast'
    """,
    "ngram_jaccard": """
        WITH pairs AS (
          SELECT d.doc_id AS a, d.doc_id + 1 AS b
          FROM documents d
          WHERE d.doc_id % 25 = 0
            AND EXISTS (SELECT 1 FROM documents e WHERE e.doc_id = d.doc_id + 1)),
        need AS (SELECT a AS x FROM pairs UNION SELECT b FROM pairs),
        idx AS (
          SELECT d.doc_id, d.text,
                 unnest(generate_series(1, greatest(length(d.text) - 4, 0))) AS i
          FROM documents d JOIN need ON d.doc_id = need.x),
        g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS gram FROM idx),
        sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT p.a, p.b, count(*) AS ni
          FROM pairs p
          JOIN g ga ON ga.doc_id = p.a
          JOIN g gb ON gb.doc_id = p.b AND gb.gram = ga.gram
          GROUP BY p.a, p.b)
        SELECT p.a, p.b,
               CASE WHEN coalesce(sa.n, 0) + coalesce(sb.n, 0)
                         - coalesce(i.ni, 0) = 0 THEN 0.0
                    ELSE CAST(coalesce(i.ni, 0) AS DOUBLE)
                         / (coalesce(sa.n, 0) + coalesce(sb.n, 0)
                            - coalesce(i.ni, 0)) END AS jaccard
        FROM pairs p
        LEFT JOIN sizes sa ON sa.doc_id = p.a
        LEFT JOIN sizes sb ON sb.doc_id = p.b
        LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
    """,
    # ALL-pairs exact char-5-gram Jaccard >= 0.6: certifies the engine's
    # LSH-candidate + exact-verify path end to end (precision exactly,
    # recall at this corpus scale)
    "dedup_minhash_verified": """
        WITH idx AS (
          SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text) - 4, 0))) AS i
          FROM documents),
        g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS gram FROM idx),
        sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS ni
          FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
          GROUP BY 1, 2)
        SELECT i.a, i.b,
               CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.a
        JOIN sizes sb ON sb.doc_id = i.b
        WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.6
    """,
    # the engine's 64-bit SimHash recomputed in pure SQL: mod-2^64
    # polynomial token hash (HUGEINT), splitmix-style multiply via 32-bit
    # split (a full 64×64 product overflows HUGEINT), xor through BIGINT
    # two's complement, per-bit signed sums, signatures packed as two
    # 32-bit halves, ALL-pairs hamming via bit_count(xor) — any pair with
    # hamming ≤ 3 shares one of four 16-bit bands (pigeonhole), so the
    # engine's banded candidates are provably complete and the row is
    # exactly comparable
    # components over the ALL-pairs exact-Jaccard relation (recursive
    # CTE, min-label), then the quality argmax (longest text, ties to
    # smallest id)
    "dedup_keep_best": """
        WITH RECURSIVE idx AS (
          SELECT d.doc_id, d.text, d.n_chars,
                 unnest(generate_series(1, greatest(length(d.text) - 4, 0))) AS i
          FROM documents d),
        g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS gram FROM idx),
        sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS ni
          FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
          GROUP BY 1, 2),
        prs AS (
          SELECT i.a, i.b
          FROM inter i
          JOIN sizes sa ON sa.doc_id = i.a
          JOIN sizes sb ON sb.doc_id = i.b
          WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.6),
        edges AS (SELECT a AS src, b AS dst FROM prs
                  UNION SELECT b, a FROM prs),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        reach(node, lbl) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        comp AS (SELECT node, min(lbl) AS c FROM reach GROUP BY node),
        best AS (
          SELECT c, node AS best_id FROM (
            SELECT comp.c, comp.node,
                   row_number() OVER (PARTITION BY comp.c
                                      ORDER BY d.n_chars DESC, comp.node ASC) AS rn
            FROM comp JOIN documents d ON d.doc_id = comp.node)
          WHERE rn = 1)
        SELECT comp.node AS doc_id, best.best_id AS canonical_id,
               comp.node = best.best_id AS keep
        FROM comp JOIN best USING (c)
    """,
    "dedup_simhash_verified": r"""
        WITH RECURSIVE p2(k, v) AS (
          SELECT 0, CAST(1 AS HUGEINT) UNION ALL SELECT k+1, v*2 FROM p2 WHERE k < 63
        ),
        pw(k, v) AS (
          SELECT 0, CAST(1 AS HUGEINT)
          UNION ALL
          SELECT k+1, (v * 1099511628211) % 18446744073709551616
          FROM pw WHERE k < 2048
        ),
        toks AS (
          SELECT doc_id, tok
          FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
                FROM documents
                WHERE regexp_matches(text, '\S')
                  AND octet_length(encode(text)) = length(text))
          WHERE tok <> ''
        ),
        tok1 AS (SELECT row_number() OVER () AS tid, doc_id, tok,
                        length(tok) AS L FROM toks),
        chars AS (
          SELECT t.tid, t.doc_id, t.L,
                 CAST(ord(substr(t.tok, CAST(p AS INTEGER), 1)) AS HUGEINT) AS b,
                 t.L - CAST(p AS INTEGER) + 1 AS e
          FROM tok1 t, unnest(range(1, t.L + 1)) AS u(p)
        ),
        thash AS (
          SELECT c.tid, c.doc_id,
                 (SUM(c.b * pw.v) + ANY_VALUE(c.L)) % 18446744073709551616 AS h
          FROM chars c JOIN pw ON pw.k = c.e
          GROUP BY c.tid, c.doc_id
        ),
        mixed AS (
          SELECT tid, doc_id,
            (
              (((h + 11) % 18446744073709551616) % 4294967296) * 11400714819323198485
              + (((((h + 11) % 18446744073709551616) // 4294967296)
                  * 11400714819323198485) % 4294967296) * 4294967296
            ) % 18446744073709551616 AS th0
          FROM thash
        ),
        thu AS (
          SELECT tid, doc_id,
            CAST(xor(
              CAST(CASE WHEN th0 >= 9223372036854775808
                        THEN th0 - 18446744073709551616 ELSE th0 END AS BIGINT),
              CAST(th0 // 536870912 AS BIGINT)
            ) AS BIGINT) AS ths
          FROM mixed
        ),
        thb AS (
          SELECT tid, doc_id,
            CASE WHEN ths < 0 THEN CAST(ths AS HUGEINT) + 18446744073709551616
                 ELSE CAST(ths AS HUGEINT) END AS u
          FROM thu
        ),
        bits AS (
          SELECT t.doc_id, CAST(bt AS INTEGER) AS bit,
                 CASE WHEN SUM(CASE WHEN (t.u // p2.v) % 2 = 1
                                    THEN 1 ELSE -1 END) > 0
                      THEN 1 ELSE 0 END AS db
          FROM thb t, unnest(range(0, 64)) AS r(bt)
          JOIN p2 ON p2.k = bt
          GROUP BY t.doc_id, bt
        ),
        sigs AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN bit < 32
                               THEN db * CAST(p2.v AS BIGINT) ELSE 0 END) AS BIGINT) AS lo,
                 CAST(SUM(CASE WHEN bit >= 32
                               THEN db * CAST(p2.v AS BIGINT) ELSE 0 END) AS BIGINT) AS hi
          FROM bits JOIN p2 ON p2.k = bit % 32
          GROUP BY doc_id
        )
        SELECT a.doc_id AS a, b.doc_id AS b,
               CAST(bit_count(xor(a.lo, b.lo))
                    + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
    """,
    # export + nested-extraction round trip recomputed from the source table
    "jsonl_doc_roundtrip": """
        SELECT lang, source,
               CAST(count(n_chars) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang, source
    """,
    # exact cosine-threshold self-join: DuckDB scores every pair, the
    # engine scores block pairs — same float64 arithmetic, same set
    "dedup_embedding_exact": """
        SELECT e1.vec_id AS a, e2.vec_id AS b
        FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
        WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= 0.35
    """,
    # decode round-trip: every decoded column is a pure function of the
    # source documents row (media_from_documents' generative rule)
    "multimodal_features": """
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio'
                               ELSE 'video' END AS dec_kind,
               TRUE AS decoded_ok,
               CAST(16 + (doc_id * 37) % 240 AS INTEGER) AS dec_width,
               CAST(16 + (doc_id * 53) % 240 AS INTEGER) AS dec_height,
               CAST(coalesce(octet_length(encode(text)), 0) AS BIGINT) AS dec_bytes
        FROM documents
    """,
    "events_props_json": """
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
               CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n
        FROM events GROUP BY event_type
    """,
    "events_hourly": """
        SELECT user_id, date_trunc('hour', ts) AS window,
               count(value) AS n_events, floor(sum(value) * 100 + 0.5) / 100 AS sum_value
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    """,
    "user_sessions": """
        WITH o AS (
          SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          FROM events)
        SELECT user_id,
               CAST(sum(CASE WHEN prev IS NULL
                        OR (epoch(ts) - epoch(prev)) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
               count(ts) AS n_events
        FROM o GROUP BY user_id
    """,
    "asof_latest_purchase": """
        SELECT l.event_id, l.user_id, l.value,
               r.event_id AS purchase_id, r.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type IN ('click', 'view')) l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "lineitem_measures_melt": """
        WITH long AS (
          SELECT l_orderkey, 'l_quantity' AS measure,
                 CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS cents,
                 l_quantity AS v FROM lineitem
          UNION ALL SELECT l_orderkey, 'l_extendedprice',
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
                 l_extendedprice FROM lineitem
          UNION ALL SELECT l_orderkey, 'l_discount',
                 CAST(floor(l_discount * 100 + 0.5) AS BIGINT),
                 l_discount FROM lineitem
          UNION ALL SELECT l_orderkey, 'l_tax',
                 CAST(floor(l_tax * 100 + 0.5) AS BIGINT),
                 l_tax FROM lineitem)
        SELECT measure, count(v) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM long GROUP BY measure
    """,
    "events_value_pivot": """
        WITH src AS (
          SELECT user_id, event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN cents END) AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'view' THEN cents END) AS BIGINT) AS view,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN cents END) AS BIGINT) AS purchase
        FROM src GROUP BY user_id
    """,
    "event_value_distribution": """
        WITH src AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT event_type, cents,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM src
        WINDOW w AS (PARTITION BY event_type ORDER BY cents)
    """,
    "event_stream_lead_tiles": """
        WITH src AS (
          SELECT event_type, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT event_type, event_id, cents,
               lead(cents) OVER w AS next_cents,
               ntile(4) OVER w AS tile,
               first_value(cents) OVER w AS first_cents,
               last_value(cents) OVER (PARTITION BY event_type
                                       ORDER BY event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING) AS last_cents
        FROM src
        WINDOW w AS (PARTITION BY event_type ORDER BY event_id)
    """,
    "events_sample": """
        SELECT event_id, user_id, event_type
        FROM events
        WHERE ((event_id % 1000003) * 2654435761) % 1000 < 50
    """,
    "event_value_ranks": """
        WITH src AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT event_type, cents,
               rank() OVER (PARTITION BY event_type ORDER BY cents) AS rnk,
               dense_rank() OVER (PARTITION BY event_type ORDER BY cents) AS drnk
        FROM src
    """,
    "customer_order_counts": """
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer
        LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
                   WHERE o_orderstatus = 'F') o
          ON o.o_custkey = c_custkey
        GROUP BY c_custkey
    """,
    "view_purchase_day_intersect": """
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'view'
        INTERSECT
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'purchase'
    """,
    "click_except_purchase_days": """
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'purchase'
    """,
    "value_bucket_counts": """
        WITH b(bucket, lo, hi) AS (VALUES
          ('low', 0, 1000), ('mid', 1000, 10000),
          ('high', 10000, 1000000000)),
        src AS (
          SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT bucket, count(cents) AS n
        FROM src CROSS JOIN b
        WHERE cents >= lo AND cents < hi
        GROUP BY bucket
    """,
    "busy_users": """
        WITH src AS (
          SELECT user_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT user_id, count(cents) AS n_events,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM src GROUP BY user_id
        HAVING count(cents) > 60
    """,
    "top_terms_heavy_hitters": """
        WITH toks AS (
          SELECT unnest(string_split(lower(text), ' ')) AS term
          FROM documents),
        counts AS (
          SELECT term, count(term) AS cnt
          FROM toks WHERE term <> '' GROUP BY term)
        SELECT term, cnt FROM counts
        ORDER BY cnt DESC, term ASC LIMIT 10
    """,
    "favorite_event_type": """
        WITH counts AS (
          SELECT user_id, event_type, count(event_type) AS n
          FROM events GROUP BY user_id, event_type)
        SELECT user_id, event_type, n
        FROM counts
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY n DESC, event_type ASC) = 1
    """,
    "bloom_filtered_revenue": """
        WITH kept AS (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
          FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                               WHERE o_orderstatus = 'F'))
        SELECT l_returnflag, count(cents) AS n_items,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM kept GROUP BY l_returnflag
    """,
    "tfidf_terms": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
          FROM documents),
        toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
        tf AS (SELECT doc_id, term, count(term) AS tf
               FROM toks2 GROUP BY doc_id, term),
        df AS (SELECT term, count(term) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 CAST(tf.tf AS DOUBLE)
                   * ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
          FROM tf JOIN df USING (term) CROSS JOIN n),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term ASC) AS rank
          FROM scored)
        SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= 5
    """,
    "lineitem_qty_price_corr": """
        WITH src AS (
          SELECT l_returnflag,
                 CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
                 CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y
          FROM lineitem),
        p AS (
          SELECT l_returnflag, count(x) AS n_rows,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM src GROUP BY l_returnflag)
        SELECT l_returnflag, n_rows,
               CASE WHEN n_rows > 1 THEN
                 (CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                      / CAST(n_rows AS DOUBLE))
                 / (CAST(n_rows AS DOUBLE) - 1.0) END AS covar_samp,
               CASE WHEN n_rows > 1
                     AND (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                          * CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE)) > 0
                     AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                          * CAST(sy AS DOUBLE) / CAST(n_rows AS DOUBLE)) > 0
                THEN (CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                          / CAST(n_rows AS DOUBLE))
                   / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                           * CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE))
                        * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                           * CAST(sy AS DOUBLE) / CAST(n_rows AS DOUBLE)))
                END AS corr
        FROM p
    """,
    "user_event_paths": """
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
               count(event_type) AS n_events
        FROM events GROUP BY user_id
    """,
    "transcript_reassembly": """
        WITH src AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                 CAST(event_id % 37 AS INTEGER) AS turn_idx,
                 CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 event_type || ' v' || CAST(event_id AS VARCHAR) AS text
          FROM events),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY seq DESC) AS rn
          FROM src),
        winners AS (
          SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
        SELECT conv_id,
               string_agg(role || ': ' || text, ' | ' ORDER BY turn_idx)
                 AS transcript,
               count(text) AS n_turns
        FROM winners GROUP BY conv_id
    """,
    "events_value_stats": """
        WITH src AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events),
        p AS (
          SELECT event_type, count(cents) AS n_rows,
                 CAST(sum(cents) AS BIGINT) AS sum_cents,
                 CAST(sum(cents * cents) AS BIGINT) AS ssq
          FROM src GROUP BY event_type)
        SELECT event_type, n_rows, sum_cents,
               CAST(sum_cents AS DOUBLE) / CAST(n_rows AS DOUBLE) AS mean_cents,
               CASE WHEN n_rows > 1 THEN
                 (CAST(ssq AS DOUBLE)
                    - CAST(sum_cents AS DOUBLE) * CAST(sum_cents AS DOUBLE)
                      / CAST(n_rows AS DOUBLE))
                 / (CAST(n_rows AS DOUBLE) - 1.0) END AS var_cents,
               CASE WHEN n_rows > 1 THEN
                 sqrt(greatest(
                   (CAST(ssq AS DOUBLE)
                      - CAST(sum_cents AS DOUBLE) * CAST(sum_cents AS DOUBLE)
                        / CAST(n_rows AS DOUBLE))
                   / (CAST(n_rows AS DOUBLE) - 1.0), 0.0)) END AS std_cents
        FROM p
    """,
    "purchase_attribution": """
        WITH l AS (
          SELECT event_id, ts, user_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events WHERE event_type IN ('click', 'view')),
        r AS (
          SELECT event_id AS purchase_id, user_id, ts
          FROM events WHERE event_type = 'purchase')
        SELECT r.purchase_id,
               count(l.event_id) AS n_attributed,
               CAST(sum(l.cents) AS BIGINT) AS value_cents
        FROM r JOIN l
          ON l.user_id = r.user_id
         AND l.ts >= r.ts AND l.ts <= r.ts + INTERVAL 2 HOUR
        GROUP BY r.purchase_id
    """,
    "top_events_per_type": """
        SELECT event_type, rn AS rank, event_id, value FROM (
          SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id) AS rn
          FROM events) WHERE rn <= 3
    """,
    "events_hopping": """
        SELECT event_type,
               date_trunc('hour', ts) - to_hours(i.i) AS "window",
               count(value) AS n_events,
               floor(sum(value) * 100 + 0.5) / 100 AS sum_value
        FROM events CROSS JOIN (VALUES (0), (1)) AS i(i)
        GROUP BY 1, 2
    """,
    "user_running_totals": """
        WITH src AS (
          SELECT user_id, event_id, value,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT user_id, event_id, value,
               row_number() OVER w AS rn,
               lag(value) OVER w AS prev_value,
               CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
        FROM src WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    "user_moving_avg": """
        WITH src AS (
          SELECT user_id, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events),
        w AS (
          SELECT user_id, event_id,
                 CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_sum_cents,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
          FROM src)
        SELECT user_id, event_id, mov_sum_cents,
               CAST(mov_sum_cents AS DOUBLE) / (CAST(least(rn, 5) AS DOUBLE) * 100.0) AS mov_avg
        FROM w
    """,
    "revenue_rollup_region": """
        WITH src AS (
          SELECT r.r_name, n.n_name, c.c_custkey,
                 CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS cents
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey)
        SELECT r_name, n_name, count(c_custkey) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS acctbal_cents
        FROM src GROUP BY ROLLUP(r_name, n_name)
    """,
    "orders_status_priority_cube": """
        WITH src AS (
          SELECT o_orderstatus, o_orderpriority, o_orderkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders)
        SELECT o_orderstatus, o_orderpriority,
               count(o_orderkey) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM src GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    "ann_cosine_topk": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                   FROM embeddings WHERE vec_id < 3),
        s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(e.embedding, q.qe) AS sim
              FROM embeddings e CROSS JOIN q),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, neighbor_id) AS rank
              FROM s)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 10
    """,
    "events_stratified_sample": """
        SELECT event_id, event_type, user_id
        FROM events
        WHERE ((event_id % 1000003) * 2654435761) % 1000 <
              CASE event_type WHEN 'purchase' THEN 1000
                              WHEN 'click' THEN 200
                              WHEN 'view' THEN 50
                              ELSE 0 END
    """,
    "embedding_components": """
        WITH e AS (
          SELECT vec_id, unnest(range(1, len(embedding)+1)) AS pos,
                 CAST(unnest(embedding) AS DOUBLE) AS comp
          FROM embeddings)
        SELECT vec_id, pos,
               CAST(floor(comp * 1000 + 0.5) AS BIGINT) AS comp_milli
        FROM e
    """,
    "revenue_by_segment": """
        SELECT c.c_mktsegment,
               count(l.l_extendedprice) AS n_items,
               floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100 AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    "orders_by_status": """
        SELECT o_orderstatus, count(o_totalprice) AS n_orders,
               floor(sum(o_totalprice) * 100 + 0.5) / 100 AS sum_total
        FROM orders GROUP BY o_orderstatus
    """,
    "part_type_stats": """
        SELECT p_type, min(p_size) AS min_size, max(p_size) AS max_size,
               count(p_size) AS n_parts
        FROM part GROUP BY p_type
    """,
    "events_daily_users": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY strftime(ts, '%Y-%m-%d')
    """,
    "events_value_outliers": """
        WITH q AS (
          SELECT event_type,
                 floor(quantile_cont(value, 0.25) * 1000000 + 0.5) / 1000000 AS q1,
                 floor(quantile_cont(value, 0.75) * 1000000 + 0.5) / 1000000 AS q3
          FROM events GROUP BY event_type),
        f AS (SELECT event_type, q1 - 1.5 * (q3 - q1) AS lo,
                     q3 + 1.5 * (q3 - q1) AS hi FROM q)
        SELECT e.event_id, e.event_type, e.value
        FROM events e JOIN f USING (event_type)
        WHERE e.value < f.lo OR e.value > f.hi
    """,
    "value_percentiles": """
        SELECT event_type,
               floor(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000 AS p50,
               floor(quantile_cont(value, 0.95) * 1000000 + 0.5) / 1000000 AS p95,
               count(value) AS n
        FROM events GROUP BY event_type
    """,
    "incremental_embedding_exact": """
        SELECT e1.vec_id AS a, e2.vec_id AS b
        FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
        WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= 0.35
          AND NOT (e1.vec_id % 3 = 0 AND e2.vec_id % 3 = 0)
    """,
    "incremental_minhash_verified": """
        WITH idx AS (
          SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text) - 4, 0))) AS i
          FROM documents),
        g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS gram FROM idx),
        sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS ni
          FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
          WHERE NOT (ga.doc_id % 3 = 0 AND gb.doc_id % 3 = 0)
          GROUP BY 1, 2)
        SELECT i.a, i.b,
               CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.a
        JOIN sizes sb ON sb.doc_id = i.b
        WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.6
    """,
    "incremental_dedup": """
        WITH prior AS (
            SELECT DISTINCT substr(lower(text), 1, 20) AS k
            FROM documents WHERE doc_id % 3 = 0
        ), novel AS (
            SELECT doc_id, substr(lower(text), 1, 20) AS k
            FROM documents WHERE doc_id % 3 <> 0
        )
        SELECT min(doc_id) AS doc_id, count(doc_id) AS n_copies
        FROM novel
        WHERE k NOT IN (SELECT k FROM prior)
        GROUP BY k
    """,
    "graph_export_edges": """
        SELECT o_orderstatus AS label,
               CAST(count(*) AS BIGINT) AS n_edges,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_orderstatus IN ('F', 'O')
        GROUP BY o_orderstatus
    """,
    "graph_khop": """
        WITH RECURSIVE edges AS (
            SELECT DISTINCT CAST(user_id AS BIGINT) AS src,
                   (CAST(user_id AS BIGINT) * 3 + event_id)
                       % (SELECT max(user_id) + 1 FROM events) AS dst
            FROM events
        ), reach(node, depth) AS (
            SELECT * FROM (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
                                  (1, 0), (2, 0)) AS s(node, depth)
            UNION
            SELECT e.dst, r.depth + 1
            FROM reach r JOIN edges e ON e.src = r.node
            WHERE r.depth < 3
        )
        SELECT node, min(depth) AS depth FROM reach GROUP BY node
    """,
    "graph_shortest_paths": """
        WITH e0 AS (
            SELECT CAST(user_id AS BIGINT) AS src,
                   (CAST(user_id AS BIGINT) * 3 + event_id)
                       % (SELECT max(user_id) + 1 FROM events) AS dst,
                   CAST(min(event_id % 97 + 1) AS BIGINT) AS w
            FROM events
            GROUP BY 1, 2
        ), d0 AS (
            SELECT * FROM (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
                                  (1, 0), (2, 0)) AS s(node, dist)
        ), d1 AS (
            SELECT node, min(dist) AS dist FROM (
                SELECT * FROM d0
                UNION ALL
                SELECT e.dst, d.dist + e.w FROM d0 d JOIN e0 e ON e.src = d.node
            ) GROUP BY node
        ), d2 AS (
            SELECT node, min(dist) AS dist FROM (
                SELECT * FROM d1
                UNION ALL
                SELECT e.dst, d.dist + e.w FROM d1 d JOIN e0 e ON e.src = d.node
            ) GROUP BY node
        ), d3 AS (
            SELECT node, min(dist) AS dist FROM (
                SELECT * FROM d2
                UNION ALL
                SELECT e.dst, d.dist + e.w FROM d2 d JOIN e0 e ON e.src = d.node
            ) GROUP BY node
        )
        SELECT node, dist FROM d3
    """,
    "graph_triangles": """
        WITH raw AS (
            SELECT CAST(user_id AS BIGINT) AS u,
                   (CAST(user_id AS BIGINT) * 7 + event_id)
                       % (SELECT max(user_id) + 1 FROM events) AS v
            FROM events
            WHERE event_id % 13 = 0
        ), e0 AS (
            SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
            FROM raw WHERE u <> v
        ), tri AS (
            SELECT e1.a, e1.b, e2.b AS c
            FROM e0 e1
            JOIN e0 e2 ON e2.a = e1.b
            JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT a, CAST(count(*) AS BIGINT) AS n_triangles
        FROM tri GROUP BY a
    """,
    "graph_pagerank": """
        WITH e0 AS (
            SELECT DISTINCT CAST(user_id AS BIGINT) AS src,
                   (CAST(user_id AS BIGINT) * 3 + event_id)
                       % (SELECT max(user_id) + 1 FROM events) AS dst
            FROM events
        ), outdeg AS (
            SELECT src, CAST(count(*) AS BIGINT) AS odeg FROM e0 GROUP BY src
        ), nodes AS (
            SELECT src AS node FROM e0 UNION SELECT dst FROM e0
        ), pr0 AS (
            SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes
        ), s1 AS (
            SELECT e.dst AS node,
                   CAST(sum((p.rank * 17) // (20 * o.odeg)) AS BIGINT) AS inc
            FROM pr0 p JOIN outdeg o ON o.src = p.node JOIN e0 e ON e.src = p.node
            GROUP BY e.dst
        ), pr1 AS (
            SELECT n.node, CAST(150000 + COALESCE(s.inc, 0) AS BIGINT) AS rank
            FROM nodes n LEFT JOIN s1 s ON s.node = n.node
        ), s2 AS (
            SELECT e.dst AS node,
                   CAST(sum((p.rank * 17) // (20 * o.odeg)) AS BIGINT) AS inc
            FROM pr1 p JOIN outdeg o ON o.src = p.node JOIN e0 e ON e.src = p.node
            GROUP BY e.dst
        ), pr2 AS (
            SELECT n.node, CAST(150000 + COALESCE(s.inc, 0) AS BIGINT) AS rank
            FROM nodes n LEFT JOIN s2 s ON s.node = n.node
        ), s3 AS (
            SELECT e.dst AS node,
                   CAST(sum((p.rank * 17) // (20 * o.odeg)) AS BIGINT) AS inc
            FROM pr2 p JOIN outdeg o ON o.src = p.node JOIN e0 e ON e.src = p.node
            GROUP BY e.dst
        ), pr3 AS (
            SELECT n.node, CAST(150000 + COALESCE(s.inc, 0) AS BIGINT) AS rank
            FROM nodes n LEFT JOIN s3 s ON s.node = n.node
        )
        SELECT node, rank FROM pr3
    """,
    "graph_components": """
        WITH RECURSIVE e0 AS (
            SELECT DISTINCT CAST(user_id AS BIGINT) AS a,
                   (CAST(user_id AS BIGINT) * 5 + event_id)
                       % (SELECT max(user_id) + 1 FROM events) AS b
            FROM events
            WHERE event_id % 97 = 0
        ), edges AS (
            SELECT a AS src, b AS dst FROM e0
            UNION
            SELECT b, a FROM e0
        ), nodes AS (
            SELECT DISTINCT src AS node FROM edges
        ), reach(node, lbl) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.dst, r.lbl
            FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT node, min(lbl) AS component FROM reach GROUP BY node
    """,
    "colocated_orders_customer": """
        SELECT o_orderkey, c_mktsegment,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "colocated_user_type_join": """
        WITH g AS (
            SELECT user_id, event_type, COUNT(*) AS n_events,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM events GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, e.event_type,
               CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS value_cents,
               g.n_events, g.sum_cents
        FROM events e JOIN g USING (user_id, event_type)
    """,
    "skew_salted_join": """
        WITH l AS (
            SELECT CASE WHEN l_orderkey % 10 < 3 THEN 1 ELSE l_orderkey END AS k,
                   CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS l_qty_cents,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS l_price_cents
            FROM lineitem
        ),
        o AS (
            SELECT CASE WHEN o_orderkey % 10 < 3 THEN 1 ELSE o_orderkey END AS k,
                   COUNT(*) AS o_cnt,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS o_total_cents
            FROM orders GROUP BY 1
        )
        SELECT l.k, l.l_qty_cents, l.l_price_cents, o.o_cnt, o.o_total_cents
        FROM l JOIN o ON l.k = o.k
    """,
    # mix64 HUGEINT replica (same chain as events_shuffle_export /
    # lake_state_digest — hash-certified there) over user_id, % 5
    "events_group_kfold": """
        WITH u0 AS (SELECT event_id, user_id,
                           CAST(user_id AS HUGEINT) AS u FROM events),
        x1 AS (SELECT event_id, user_id,
                      CAST(xor(CAST(u AS BIGINT), CAST(u // 8589934592 AS BIGINT)) AS HUGEINT) AS x FROM u0),
        x1u AS (SELECT event_id, user_id,
                       CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS x FROM x1),
        m AS (SELECT event_id, user_id,
                     ((x % 4294967296) * 3981806797
                    + (((x % 4294967296) * 4283543511
                        + (x // 4294967296) * 3981806797) % 4294967296)
                      * 4294967296) % 18446744073709551616 AS v FROM x1u),
        ms AS (SELECT event_id, user_id,
                      CASE WHEN v >= 9223372036854775808
                           THEN v - 18446744073709551616 ELSE v END AS s,
                      v // 8589934592 AS hi FROM m),
        h2 AS (SELECT event_id, user_id,
                      CAST(xor(CAST(s AS BIGINT),
                               CAST(CASE WHEN hi >= 9223372036854775808
                                         THEN hi - 18446744073709551616
                                         ELSE hi END AS BIGINT)) AS HUGEINT) AS x
               FROM ms),
        hu AS (SELECT event_id, user_id,
                      CASE WHEN x < 0 THEN x + 18446744073709551616 ELSE x END AS h FROM h2)
        SELECT CAST(h % 5 AS BIGINT) AS fold,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM hu GROUP BY 1
    """,
    "events_window_dedup": """
        SELECT user_id, event_type,
               date_trunc('hour', ts) AS window_start,
               CAST(min(event_id) AS BIGINT) AS first_event_id,
               CAST(count(*) AS BIGINT) AS n_dups
        FROM events GROUP BY 1, 2, 3
    """,
    # bigram LM: adjacency over the COMPACTED token stream (row_number
    # after empty-drop), per-transition lp = ln of ONE IEEE division
    # snapped to int64 micros — the docs_lm_perplexity discipline one
    # order higher
    "docs_bigram_perplexity": """
        WITH tokpos AS (
          SELECT doc_id, lang,
                 unnest(range(1, len(ts)+1)) AS pos, unnest(ts) AS tok
          FROM (SELECT doc_id, lang,
                       string_split(lower(text), ' ') AS ts FROM documents)),
        tp AS (
          SELECT doc_id, lang, tok,
                 row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS idx
          FROM tokpos WHERE tok <> ''),
        big AS (
          SELECT a.doc_id, a.lang, a.tok AS w1, b.tok AS w2
          FROM tp a JOIN tp b ON b.doc_id = a.doc_id AND b.idx = a.idx + 1),
        cb AS (SELECT w1, w2, count(*) AS c2 FROM big
               WHERE lang = 'en' GROUP BY 1, 2),
        cc AS (SELECT w1, count(*) AS c1 FROM big
               WHERE lang = 'en' GROUP BY 1),
        vv AS (SELECT count(DISTINCT tok) AS v FROM tp WHERE lang = 'en'),
        scored AS (
          SELECT big.doc_id,
                 CASE WHEN cb.c2 IS NULL THEN 1 ELSE 0 END AS oov,
                 CAST(floor(ln(CAST(coalesce(cb.c2, 0) + 1 AS DOUBLE)
                              / CAST(coalesce(cc.c1, 0) + vv.v AS DOUBLE))
                            * 1000000.0 + 0.5) AS BIGINT) AS lp
          FROM big LEFT JOIN cb USING (w1, w2) LEFT JOIN cc USING (w1)
          CROSS JOIN vv),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST(sum(oov) AS BIGINT) AS n_oov,
                 CAST(sum(lp) AS BIGINT) AS logp_micro
          FROM scored GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,
               CAST(coalesce(a.logp_micro, 0) AS BIGINT) AS logp_micro
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    # incremental twin: two index epochs (prior + new crawl) merged must
    # equal a ONE-SHOT bigram fit over the whole corpus — same oracle as
    # docs_bigram_perplexity without the lang restriction
    "incremental_bigram_perplexity": """
        WITH tokpos AS (
          SELECT doc_id,
                 unnest(range(1, len(ts)+1)) AS pos, unnest(ts) AS tok
          FROM (SELECT doc_id,
                       string_split(lower(text), ' ') AS ts FROM documents)),
        tp AS (
          SELECT doc_id, tok,
                 row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS idx
          FROM tokpos WHERE tok <> ''),
        big AS (
          SELECT a.doc_id, a.tok AS w1, b.tok AS w2
          FROM tp a JOIN tp b ON b.doc_id = a.doc_id AND b.idx = a.idx + 1),
        cb AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
        cc AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
        vv AS (SELECT count(DISTINCT tok) AS v FROM tp),
        scored AS (
          SELECT big.doc_id,
                 CASE WHEN cb.c2 IS NULL THEN 1 ELSE 0 END AS oov,
                 CAST(floor(ln(CAST(coalesce(cb.c2, 0) + 1 AS DOUBLE)
                              / CAST(coalesce(cc.c1, 0) + vv.v AS DOUBLE))
                            * 1000000.0 + 0.5) AS BIGINT) AS lp
          FROM big LEFT JOIN cb USING (w1, w2) LEFT JOIN cc USING (w1)
          CROSS JOIN vv),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST(sum(oov) AS BIGINT) AS n_oov,
                 CAST(sum(lp) AS BIGINT) AS logp_micro
          FROM scored GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,
               CAST(coalesce(a.logp_micro, 0) AS BIGINT) AS logp_micro
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    # temperature (alpha=0.5) mixture: sqrt is IEEE-correctly-rounded so
    # the micro-snapped weights match numpy bit-for-bit; everything after
    # the snap is HUGEINT integer arithmetic
    "events_temperature_sample": """
        WITH n AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        w AS (SELECT event_type, n,
                     CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
                          AS HUGEINT) AS wm FROM n),
        tot AS (SELECT sum(wm) AS sw FROM w),
        r AS (SELECT event_type, n,
                     least(CAST(1000000 AS HUGEINT),
                           greatest(CAST(1 AS HUGEINT),
                                    (CAST(1000000 AS HUGEINT) * 20000 * wm)
                                    // (sw * n))) AS rate_ppm
              FROM w CROSS JOIN tot)
        SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_kept
        FROM events e JOIN r USING (event_type)
        WHERE ((e.event_id % 1000003) * 2654435761) % 1000000
              < CAST(r.rate_ppm AS BIGINT)
        GROUP BY 1
    """,
    "colocated_custkey_stats": """
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM orders GROUP BY 1
    """,
    # rows-only (non-SQL-expressible) entries intentionally omitted:
    # lang_id, dedup_minhash, dedup_simhash, ann_ivf,
    # multimodal_features, dedup_embedding (IVF-approximate pair set)
}

# the declarative runner replays the exact same derived CDC stream as the
# programmatic flagship — one oracle, two engine surfaces
ORACLE_SQL["job_json_roundtrip"] = ORACLE_SQL["transcript_cdc_replay"]

# the DR replica must be value-identical to the primary's replay — same
# oracle, third engine surface (incremental replicate_lake sync)
ORACLE_SQL["lake_replication"] = ORACLE_SQL["transcript_cdc_replay"]

# snapshot diff: LWW state at the two watermarks, FULL JOIN on the key,
# kept where a side is absent or the winning seq moved — exactly the
# engine's seq-version classification
ORACLE_SQL["lake_snapshot_diff"] = """
    WITH src AS (
      SELECT event_id AS seq,
             CASE WHEN event_id % 10 < 6 THEN 'I'
                  WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
             'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
             CAST(event_id % 37 AS INTEGER) AS turn_idx,
             CASE WHEN (event_id % 37) % 2 = 0 THEN 'user'
                  ELSE 'assistant' END AS role,
             event_type || ' v' || CAST(event_id AS VARCHAR) AS text,
             CASE WHEN event_id % 5 = 0 THEN 'search'
                  WHEN event_id % 5 = 1 THEN 'python' ELSE NULL END AS tool,
             ts
      FROM events),
    mx AS (SELECT CAST(max(event_id) AS BIGINT) * 6 // 10 AS w1 FROM events),
    r1 AS (
      SELECT s.*, row_number() OVER (PARTITION BY conv_id, turn_idx
                                     ORDER BY seq DESC) AS rn
      FROM src s, mx WHERE s.seq <= mx.w1),
    s1 AS (SELECT conv_id, turn_idx, role, text, tool, ts, seq
           FROM r1 WHERE rn = 1 AND op <> 'D'),
    r2 AS (
      SELECT s.*, row_number() OVER (PARTITION BY conv_id, turn_idx
                                     ORDER BY seq DESC) AS rn
      FROM src s),
    s2 AS (SELECT conv_id, turn_idx, role, text, tool, ts, seq
           FROM r2 WHERE rn = 1 AND op <> 'D')
    SELECT
      CASE WHEN s1.seq IS NULL THEN 'insert'
           WHEN s2.seq IS NULL THEN 'delete'
           ELSE 'update' END AS op,
      conv_id, turn_idx,
      CASE WHEN s2.seq IS NULL THEN s1.role ELSE s2.role END AS role,
      CASE WHEN s2.seq IS NULL THEN s1.text ELSE s2.text END AS text,
      CASE WHEN s2.seq IS NULL THEN s1.tool ELSE s2.tool END AS tool,
      strftime(CASE WHEN s2.seq IS NULL THEN s1.ts ELSE s2.ts END,
               '%Y-%m-%d %H:%M:%S') AS ts_str,
      CASE WHEN s2.seq IS NULL THEN s1.seq ELSE s2.seq END AS seq
    FROM s1 FULL JOIN s2 USING (conv_id, turn_idx)
    WHERE s1.seq IS NULL OR s2.seq IS NULL OR s1.seq <> s2.seq
"""

# the HLL accuracy contract: exact distinct count is SQL, the in-bound flag
# is asserted engine-side (TRUE here) — a sketch regression hash-fails
ORACLE_SQL["approx_users_hll_verified"] = """
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS hll_within_5pct
    FROM events
"""

# the CSV-LZO roundtrip is lossless, so the oracle is the plain aggregate
ORACLE_SQL["csv_lzo_roundtrip"] = """
    SELECT event_type,
           CAST(count(event_id) AS BIGINT) AS n_events,
           CAST(sum(user_id) AS BIGINT) AS sum_uid,
           max(event_id) AS max_eid
    FROM events
    GROUP BY event_type
"""
