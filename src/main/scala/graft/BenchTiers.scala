package graft

/** The bench tier sets WITH their per-gate adjudication — extracted
  * from Bench so the membership rules are a checkable artifact
  * (VERDICT r14 item 7) instead of source comments. Every gate in
  * SparkEntry.queries must appear in exactly one place: an x100Keep
  * group, an sf1-only group, or an excluded group — TierTableSpec
  * enforces exhaustiveness, so a new gate cannot land without its
  * adjudication, and `graft.TierTable` regenerates TIERS.md from
  * these groups.
  *
  * The rules themselves (BASELINE.md, r6/r9/r14 precedents):
  *   - full-corpus scan or modulo slice → sf1Head (timed in the ×10
  *     pass, which publishes the x10/x1 scaling ratio; >12 flags an
  *     offender. Since r16 the ×10 pass times ONLY sf1Head — the
  *     excluded gates' ratios were adjudicated as JVM fixed cost, and
  *     timing them anyway is what starved the wall budget);
  *   - heavy corpus-proportional gates additionally → x100Keep (the
  *     recurring memory-pressure tier, ~60 s budget);
  *   - pair-output-quadratic gates under the blowup's copy clusters →
  *     sf1Head but NEVER x100Keep (the q28 exclusion rule: re-running
  *     re-measures output volume, not plan quality);
  *   - constant planted slices, SF-constant fixtures, and sub-0.2 s
  *     star-schema gates → neither (their ratio reads fixed cost).
  */
object BenchTiers {

  /** The recurring ×100 tier: corpus-proportional heavy gates, each
    * with the one-line reason it measures something at ×100.
    */
  val x100Groups: Seq[(String, Set[String])] = Seq(
    "full-corpus digest/gram/token scan — input grows with the corpus" ->
      Set("q20_exact_dedup", "q49_decontaminate", "q51_tfidf_keywords",
        "q55_sequence_pack", "q61_token_chunks", "q62_url_normalize",
        "q64_boilerplate_grams", "q65_bpe_tokens", "q87_vocab_coverage",
        "q93_quality_classifier", "q189_dom_density"),
    "quadratic-OUTPUT representative: blowup copies are near-dups with distinct content, pairs grow with copies^2 — kept as the one recurring probe of that class" ->
      Set("q29_simhash_neardup"),
    "worst case by construction: every blowup copy shares every 5-gram, ~all tokens masked" ->
      Set("q68_span_dedup"),
    "scan + broadcast-rate join, flat by design — measured so flatness is observed, not asserted" ->
      Set("q69_temperature_sample"),
    "full-documents digest aggregate + tiny digest-keyed self-join" ->
      Set("q182_source_overlap"),
    "two gradient passes over the corpus-proportional long-format feature frame" ->
      Set("q188_hashed_ngram_train"),
    "the composed curation front door: per-row stages + digest dedup + source stats" ->
      Set("q207_curation_cascade"))

  val x100Keep: Set[String] = x100Groups.flatMap(_._2).toSet

  /** Gates whose x10/x1 ratio is DESIGNED super-linear — the blowup's
    * copy clusters are mutual near-dups, so q28's exact rerank output
    * (and hence its cost) grows with copies², the same property that
    * already keeps it out of x100Keep and q34/q179 out of the ×10 pass
    * entirely. The r16 driver run read q28 at ratio 33.8 on a 5–8×
    * loaded box and the sf1 gt12x alarm fired on it (VERDICT r16 item
    * 3): a gate whose EXPECTED ratio exceeds the alarm line turns the
    * "zero >12× offenders" claim into a coin-flip on ambient load.
    * These gates stay in sf1Head (the ratio is still recorded and its
    * band is still evidence) but the summary reports them under
    * `gt12x_expected`, separate from genuine offenders.
    */
  val expectedSuperlinear: Set[String] = Set("q28_minhash_neardup")

  /** sf1-only members (the x100 tier is implicitly included in
    * sf1Head), grouped by the reason their x10/x1 ratio is a
    * scaling signal.
    */
  val sf1Groups: Seq[(String, Set[String])] = Seq(
    "near-dup/minhash family: banded candidate generation over the full corpus; pair output grows with copy clusters so these stay OUT of x100 (q28 rule)" ->
      Set("q28_minhash_neardup", "q45_minhash_portable", "q46_simhash_portable",
        "q66_incremental_neardup", "q94_banded_neardup"),
    "connected-components family: SF-constant BY DESIGN (planted fixture) — in the tier so flatness is measured each round, not asserted" ->
      Set("q53_dedup_clusters", "q54_canonical_corpus", "q71_leakage_safe_split",
        "q84_incremental_components", "q95_retract_components", "q122_keep_best"),
    "embedding family: full-embeddings scans, IVF probes, retraction" ->
      Set("q25_embed_topk", "q57_kmeans_step", "q70_semantic_decontaminate",
        "q89_ivf_probe", "q92_hard_negatives_ivf", "q96_retract_digests",
        "q98_retract_packing", "q138_sign_project", "q149_mean_pool",
        "q202_opq_learned", "q209_hashed_cosine"),
    "skew/quality/LM training: corpus-proportional aggregation or scoring scans" ->
      Set("q88_salted_join", "q99_trained_classifier", "q101_ngram_lm",
        "q103_lm_interpolated", "q107_kneser_ney", "q108_perplexity_buckets",
        "q111_dsir_weights"),
    "full-corpus per-row screen / text family" ->
      Set("q21_token_stats", "q22_quality_score", "q23_lang_id",
        "q60_bloom_decontaminate",
        "q32_doc_pipeline", "q33_json_props", "q39_subword_tokens",
        "q40_repetition", "q47_redact_pii", "q97_lang_id_wide",
        "q109_gopher_rules", "q116_dedup_lines_within", "q121_nfc_normalize",
        "q125_redact_cards", "q126_blocklist_screen", "q129_sentences",
        "q130_common_sentences", "q183_mixed_script", "q196_type_token",
        "q203_lz_repetition"),
    "sampling / splits / mixtures / quotas: md5-bucket scans over the corpus" ->
      Set("q35_hash_split", "q36_stratified_sample", "q37_shuffle_order",
        "q48_mixture_interleave", "q52_quantile_filter", "q124_cap_per_group",
        "q127_quota_admit", "q132_stratified_budget", "q135_epoch_plan",
        "q170_weighted_take", "q210_token_budget"),
    "sketches: bounded mergeable state over a full scan" ->
      Set("q50_kmv_distinct", "q85_sketch_quantile_band", "q114_cm_sketch",
        "q115_cm_heavy_hitters", "q123_sketch_grid", "q147_kmv_setops"),
    "events family: sessionize/asof/interval/window shapes over the blown events table" ->
      Set("q26_event_hourly", "q27_sessionize", "q38_asof_join",
        "q63_scd2_history", "q72_interval_join", "q73_grouped_topk",
        "q74_asof_tolerance", "q78_gap_fill", "q79_cohort_retention",
        "q80_funnel", "q81_histogram", "q82_rolling_window", "q83_expectations"),
    "incremental/retractable state over modulo batches" ->
      Set("q118_incremental_agg", "q119_retract_agg", "q184_overlap_incremental"),
    "web graph / crawl: documents-derived host graph (corpus-proportional edges), robots, sitemaps, mirrors" ->
      Set("q131_host_pagerank", "q133_trustrank", "q134_mirror_hosts",
        "q148_robots_screen", "q150_crawl_schedule", "q153_sitemap_frontier",
        "q173_hits", "q174_crawl_depth", "q197_host_neighborhood"),
    "retrieval / lexical index lifecycle: postings-proportional probes, admit/retract, eval, calibration" ->
      Set("q139_bm25_topk", "q140_rrf_fusion", "q141_bm25_probe",
        "q142_inverted_index", "q143_phrase_match", "q144_lex_admit",
        "q145_lex_retract", "q146_boolean_probe", "q151_phrase_probe",
        "q152_index_refresh", "q154_packed_postings", "q155_retrieval_eval",
        "q156_isotonic_fit", "q157_calibrated_scores"),
    "output layout: shards, manifests, compaction, vacuum, file-skipping state" ->
      Set("q158_snake_shards", "q159_shard_manifest", "q161_compaction_plan",
        "q162_retract_manifest", "q168_admit_manifest", "q169_vacuum_plan",
        "q171_bloom_skip_lookup", "q172_retract_file_blooms", "q67_bpe_chunks"),
    "repetition/template signals and per-group tiles over the full corpus" ->
      Set("q175_group_tile", "q176_gram_repetition", "q177_line_repetition",
        "q178_host_template"),
    "tokenizer training/serving: corpus word-frequency scans (the fit loop is vocabulary-bounded driver state)" ->
      Set("q185_unigram_train", "q186_unigram_encode", "q192_tokenizer_eval",
        "q193_unigram_prune", "q194_unigram_admit", "q195_unigram_retract",
        "q198_unigram_lattice", "q199_lattice_prune", "q200_lattice_admit",
        "q201_byte_bpe", "q204_lattice_fertility", "q213_lattice_bytes",
        "q214_lattice_bytes_fertility"),
    "curation composites: cascade, growth curves, ledger folds over the corpus" ->
      Set("q206_vocab_growth", "q208_vocab_admit", "q211_vocab_by_lang",
        "q212_cascade_by_source"),
    "composed corpus build/admission/takedown: chains corpus-proportional stages end to end; the near-dup leg's pair output grows with copy clusters — sf1 only (q28 rule)" ->
      Set("q215_corpus_build", "q216_corpus_admit", "q221_corpus_takedown"),
    "composed day-2 maintenance loop: corpus-proportional diff/tokenize legs, diff-proportional refresh legs, metadata-proportional compaction/vacuum" ->
      Set("q231_corpus_maintain"),
    "probe-slice x full-corpus cosine mining (the q70 class)" ->
      Set("q217_bitext_margin"),
    "formats + media: fused encode->walk over a doc_id modulo slice (the slice grows with the corpus — copies keep their residue); binary stays on executors" ->
      Set("q112_warc_roundtrip", "q128_image_dhash_pairs",
        "q218_mp4_sample_stats", "q219_mp3_frame_stats", "q220_media_route",
        "q222_h264_sps", "q223_flac_stream_info", "q224_ogg_pages",
        "q225_hevc_sps", "q226_subtitle_cues", "q227_caption_screen",
        "q228_head_meta", "q229_jpeg_exif", "q230_id3_tags",
        "q232_png_chunks", "q233_mkv_tracks", "q234_tar_entries",
        "q235_zip_entries"))

  val sf1Head: Set[String] = x100Keep ++ sf1Groups.flatMap(_._2).toSet

  /** Gates in NEITHER tier, each with its one-line adjudication. */
  val excludedGroups: Seq[(String, Set[String])] = Seq(
    "sub-0.2 s star-schema gate: at that cost the x10 ratio reads JVM fixed cost, not plan growth" ->
      Set("q01_pruned_scan", "q02_daily_count", "q03_scalar_sums",
        "q04_group_sums_top4", "q05_ratio_by_flag", "q06_join_agg",
        "q07_threeway_join", "q08_anti_dedup", "q09_semi_join",
        "q10_distinct", "q11_validate_counts", "q12_case_map",
        "q13_topbottom", "q14_window_running", "q15_distinct_agg",
        "q16_set_ops", "q17_string_funcs", "q18_rollup",
        "q19_dates_percentile", "q21_array_funcs", "q41_pivot",
        "q42_sql_subqueries", "q43_profile", "q44_salted_agg",
        "q75_unpivot", "q76_zorder_value", "q113_zorder_stats",
        "q120_rank_zorder"),
    "constant planted slice (exact-oracle kernel): input does not grow with the corpus, the ratio would measure fixed cost only" ->
      Set("q24_shingle_jaccard", "q56_normalize_text", "q58_incremental_dedup",
        "q59_html_extract", "q86_paragraph_dedup", "q90_drift_report",
        "q91_hard_negatives", "q100_pq_exact", "q102_pq_train",
        "q104_int8_exact", "q105_retract_pq", "q106_hard_negatives_pq",
        "q110_semantic_dedup", "q136_redact_ipv4", "q137_snapshot_diff",
        "q160_winnow_fingerprints", "q163_winnow_pairs", "q164_gram_matrix",
        "q165_redact_phones", "q166_confirm_pairs", "q167_power_iteration",
        "q180_containment", "q187_rq_exact", "q190_retract_rq",
        "q191_opq_identity", "q205_pca_project"),
    "pair output grows quadratically under blowup copy clusters: the ratio measures output volume, not plan quality (the q28-at-x100 rule applied at x10; q34 is additionally skipped from the x10 pass as the exact all-pairs oracle kernel)" ->
      Set("q34_embed_neardup", "q77_fuzzy_join", "q179_interval_overlap"),
    "SF-constant synthetic media fixture (500 rows at every SF)" ->
      Set("q30_media_meta", "q31_frame_sample"),
    "rows-only gate; its oracle-gated portable twin q203_lz_repetition carries the scaling record" ->
      Set("q117_compression_signal"),
    "pure arithmetic, no table input" ->
      Set("q181_lsh_plan"))

  val excluded: Set[String] = excludedGroups.flatMap(_._2).toSet

  /** One-line adjudication for any gate name (None = unadjudicated —
    * TierTableSpec fails on those).
    */
  def reason(name: String): Option[String] =
    (x100Groups ++ sf1Groups ++ excludedGroups)
      .collectFirst { case (r, gs) if gs(name) => r }

  /** The generated membership table (TIERS.md body). */
  def membershipTable(allQueries: Seq[String]): String = {
    val header =
      """# Bench tier membership (generated — do not edit)
        |
        |Regenerate with `sbt "runMain graft.TierTable"`. Source of
        |truth: `graft.BenchTiers` (exhaustiveness enforced by
        |TierTableSpec — every gate must carry an adjudication).
        |
        |Tiers: `sf1` is timed in the bench's x10 pass, which
        |publishes the x10/x1 scaling ratio (ratio > 12 flags an
        |offender; since r16 the x10 pass times ONLY this tier —
        |excluded gates were adjudicated as fixed-cost noise);
        |`x100` additionally runs in the recurring memory-pressure
        |tier on the 100x documents blowup.
        |
        || gate | sf1 | x100 | adjudication |
        ||---|---|---|---|""".stripMargin
    val rows = allQueries.sorted.map { q =>
      val s1 = if (sf1Head(q)) "yes" else "—"
      val s100 = if (x100Keep(q)) "yes" else "—"
      val marker =
        if (expectedSuperlinear(q))
          " [expected-superlinear: pair output grows with copies² by design — exempt from the gt12x alarm, reported under gt12x_expected]"
        else ""
      s"| $q | $s1 | $s100 | ${reason(q).getOrElse("UNADJUDICATED")}$marker |"
    }
    (header +: rows).mkString("\n") + "\n"
  }
}

/** Regenerates TIERS.md from [[BenchTiers]]. */
object TierTable {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/TIERS.md")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      BenchTiers.membershipTable(SparkEntry.queries.keys.toSeq).getBytes("UTF-8"))
    println(s"[tiers] written to $out")
  }
}
