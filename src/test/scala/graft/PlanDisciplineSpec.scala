package graft

import graft.tools.PlanSigs

/** Registry-WIDE plan-discipline gates (round 15 — VERDICT r14 #3):
  * the two invariants that previously lived only in comments and
  * one-time audits, now enforced on every query, every run.
  *
  * 1. No unpartitioned Window over an unbounded frame. A Window with
  *    an empty partitionSpec moves EVERY row of its child through ONE
  *    sort task — admissible only when the child is provably bounded
  *    (value-domain-bounded histograms, `.limit(k)` frames, per-group
  *    post-aggregates over a bounded key domain). gini_index and
  *    spearman_rho slipped SF-proportional frames through this hole
  *    in round 14; their two-level bucket-offset rewrite leaves only
  *    the bounded bucket frames ("gbkt") here.
  *
  * 2. No broadcast HINT on an unbounded frame. `broadcast(df)`
  *    overrides size-based planning and ships the frame to every
  *    executor no matter how large it grows with SF — admissible only
  *    on provably bounded frames (the round-8 hint audit, frozen as
  *    data). spearman_rho's reverted form hinted SF-proportional rank
  *    maps; unhinted joins stay free for AQE to broadcast when small.
  *
  * Every whitelist entry below is an explicit boundedness claim for a
  * specific frame, keyed by a structural signature (PlanSigs): order
  * columns for windows, output columns for hinted sides. Adding a new
  * unpartitioned window or broadcast hint FAILS these gates until the
  * frame is consciously whitelisted — regenerate candidate entries
  * with `sbt "Test/runMain graft.tools.PlanWalk"` and justify each
  * new line. Boundedness arguments for the current entries:
  *
  *  - "gbkt"/"gbkt,goff": bucketedCumBefore's level-1 bucket frame —
  *    cardinality = value-domain / bucket-width, flat in table size.
  *  - "y"/"tmid"/"bucket"/"bin"/"hi,lo": centi-value / score-bucket
  *    histograms — bounded by the quantized value DOMAIN.
  *  - "h,vec_id" (pq_codes/pq_topk): rides a `.limit(nCode)` frame.
  *  - "price_cents" (skyline): distinct part prices — domain-bounded.
  *  - domain_reweight's ""-order windows: the ≤32-row domain frame
  *    (constant partition key folded away by the optimizer);
  *    share_of_total's: the 5-row per-region post-aggregate.
  *  - dimension outputs (n_*, r_*): nation=25 / region=5 rows at any
  *    SF; scalar/cutoff frames (1 row); top-k / capped frames
  *    (TakeOrdered, MaxBandBucket, vocab cuts); sketch blobs (bloom,
  *    cms); audited per-query in their own PlanSpec gates.
  */
class PlanDisciplineSpec extends SparkSpec {

  private val AllowedUnpartitionedWindows: Map[String, Seq[String]] = Map(
    "auc_pr" -> Seq("bucket"),
    "classifier_auc" -> Seq("bucket"),
    "classifier_calibration" -> Seq("bin"),
    // the 30-row stacked replicate-mean frame
    "bootstrap_ci" -> Seq("mean_x1e4,b"),
    "domain_reweight" -> Seq("", "", "", "", ""),
    // the div-1e6 projection histogram — value-DOMAIN-bounded
    // (≤ dims·1e3·1e6 / 1e6 ≈ 1.3e5 distinct at ANY SF); the constant
    // 'space' key folds away, leaving Drift.ks' windows unpartitioned
    "embed_drift" -> Seq("", "value"),
    "gini_index" -> Seq("gbkt"),
    "kruskal_wallis" -> Seq("y"),
    "mannwhitney_u" -> Seq("y"),
    // the ≤31-row daily frame: rank+running-sum, cum-sum, running-min
    "page_hinkley" -> Seq("day", "day", "day"),
    "pq_codes" -> Seq("h,vec_id"),
    "pq_topk" -> Seq("h,vec_id", "h,vec_id"),
    // three bucketedCumBefore level-1 bucket frames (r / f / m)
    "rfm_segments" -> Seq("gbkt", "gbkt", "gbkt"),
    "share_of_total" -> Seq(""),
    "skyline_frontier" -> Seq("price_cents"),
    "spearman_rho" -> Seq("gbkt", "gbkt"),
    // the ≤465-row pairwise-slope frame of the ≤31-row daily series
    "theil_sen" -> Seq("slope_x1e6,di,dj"),
    // the post-limit 100-row vocab cut (rank re-derivation)
    "zipf_fit" -> Seq("n,token")
  )

  private val AllowedBroadcastHints: Map[String, Seq[String]] = Map(
    "active_learning" -> Seq("n_neg,n_pos", "neg_tot,pos_tot,v", "term,w_x1e6"),
    "ann_binary" -> Seq("qhi,qlo,qv"),
    "ann_lsh" -> Seq("__qv,qbucket"),
    "ann_recall" -> Seq("__qv", "__qv", "__qv", "__qv", "__qv", "code_id,qd2,subspace", "code_id,qd2,subspace", "code_id,qd2,subspace", "code_id,qd2,subspace", "code_id,qd2,subspace", "vec_id", "vec_id", "vec_id", "vec_id", "vec_id"),
    "approx_quantiles" -> Seq("event_type,hi25,hi50,hi90,lo25,lo50,lo90"),
    // the 1-row positive-total aggregate of the ≤4096-bucket frame
    "auc_pr" -> Seq("tot_pos"),
    "assoc_rules" -> Seq("n_baskets"),
    "benford_audit" -> Seq("digit,p9", "n"),
    "bigram_logprob" -> Seq("v"),
    "bloom_contam" -> Seq("bloom", "hit,sh"),
    // train (lo, hi) ×2, the ≤10-row rate table, the 1-row base rate
    "brier_score" -> Seq("base_rate_x1e6", "bin,rate_x1e6", "hi,lo", "hi,lo"),
    "bm25_topk" -> Seq("n_docs,tot"),
    // the 3-cell CI aggregate of the 30-row replicate frame
    "bootstrap_ci" -> Seq("ci_hi_x1e4,ci_lo_x1e4,n_reps"),
    "cdc_chunks" -> Seq("cdc_shared", "fixed_shared", "n_chunks_cdc,total_chars", "n_unique_cdc,unique_chars"),
    "cdc_merge" -> Seq("__new_c_acctbal,__new_c_name,c_custkey,op"),
    "classifier_auc" -> Seq("hi,lo", "n_neg,n_pos", "n_neg,n_pos", "neg_tot,pos_tot,v", "neg_tot,pos_tot,v", "term,w_x1e6", "term,w_x1e6"),
    "classifier_calibration" -> Seq("hi,lo", "n_neg,n_pos", "n_neg,n_pos", "neg_tot,pos_tot,v", "neg_tot,pos_tot,v", "term,w_x1e6", "term,w_x1e6"),
    "cms_freq" -> Seq("cms"),
    "colbert_maxsim" -> Seq("qid,qterm,qv"),
    "contam_check" -> Seq("hit,sh"),
    "corpus_pipeline" -> Seq("doc_id", "doc_id", "hit,sh", "hit,sh", "permille,stratum"),
    "corpus_pipeline_incremental" -> Seq("doc,n_new", "doc_id", "doc_id", "doc_id", "hit,sh", "hit,sh", "permille,stratum", "sh", "sh", "sh", "sh", "sh", "sh", "sh"),
    "cosine_topk" -> Seq("__qv"),
    "cube_agg" -> Seq("n_name,n_nationkey,n_regionkey", "r_name,r_regionkey"),
    "dedup_incremental" -> Seq("band,batch_doc,bh", "batch_doc,bsig,corpus_doc"),
    "dedup_keep_best" -> Seq("group,node"),
    // the 1-row exact time midpoint (the ks_drift/psi_drift seam)
    "diff_in_diff" -> Seq("tmid"),
    "dim_join" -> Seq("n_name,n_nationkey,n_regionkey", "r_name,r_regionkey"),
    "domain_reweight" -> Seq("c_tot,v"),
    "dsir_weights" -> Seq("c_tot,t_tot,v"),
    // the ≤64-row micro-mean direction
    "embed_drift" -> Seq("c6,dim"),
    "embed_outliers" -> Seq("nv,sd"),
    "excess_suppliers" -> Seq("n_nationkey"),
    "feature_mi" -> Seq("n,npos"),
    "fuzzy_match" -> Seq("blk,cn", "blk,cn"),
    "gini_index" -> Seq("gbkt,goff"),
    "graph_triangles" -> Seq("n_edges", "n_triangles"),
    "grouping_sets" -> Seq("n_name,n_nationkey,n_regionkey", "r_name,r_regionkey"),
    "hard_negatives" -> Seq("qq,query_id"),
    // the ≤ k−1-counter MG sketch (k = 40) and the 1-row token total
    "heavy_hitters" -> Seq("est_count,token", "n"),
    "heldout_perplexity" -> Seq("v"),
    "herfindahl_index" -> Seq("n_name,n_nationkey"),
    "holt_linear" -> Seq("day,forecast_x1e6,level_x1e6,trend_x1e6"),
    "hybrid_rrf" -> Seq("df,term", "df,term", "n_docs", "n_docs", "qid,qq", "qid,qq"),
    "image_neardup" -> Seq("n_expected", "n_pairs", "n_planted"),
    "ivf_trained_topk" -> Seq("bucket", "cid,cv", "qq", "qv"),
    "k_anonymity" -> Seq("nation,segment", "nation,segment", "nation,segment", "region,segment"),
    "kcore_decomp" -> Seq("unstable"),
    "kruskal_wallis" -> Seq("t3"),
    "ks_drift" -> Seq("tmid"),
    "l_diversity" -> Seq("nation,segment"),
    "lake_bloom_point" -> Seq("__dv_path,__dv_pos", "__dv_path,__dv_pos", "__dv_path,__dv_pos"),
    // deletion-sized DV frames (readState's MOR anti-join), one per
    // partition-pruned year read — bounded by the delete volume
    // deletion-sized DV probes across the per-version diff sides
    // (readState's MOR anti-join, one per DV'd state read in the
    // history walk) — the round-21 single-aggregate CDC diff reads
    // each touched DV'd state ONCE, so 6 probes became 3
    "lake_cdf_history" -> Seq("__dv_path,__dv_pos", "__dv_path,__dv_pos",
      "__dv_path,__dv_pos"),
    // source + clone DV probes (deletion-sized) and the clone's 1-row agg
    "lake_clone" -> Seq("__dv_path,__dv_pos", "__dv_path,__dv_pos", "clone_cents,n_clone"),
    "lake_partition_prune" -> Seq("__dv_path,__dv_pos", "__dv_path,__dv_pos"),
    // the 1-row IS-NOT-NULL-side aggregate attached to the IS-NULL side
    "lake_null_prune" -> Seq("n_notnull_rows,notnull_note_sum"),
    // the 1-row v0 (pre-rename) aggregate attached to the head cells
    "lake_rename" -> Seq("n_v0_rows,v0_cents"),
    // the 1-row VERSION AS OF 1 aggregate attached to the head cells
    "lake_sql_catalog" -> Seq("n_v1_rows,v1_cents"),
    // one DV probe fewer after the round-21 single-aggregate CDC diff
    // (the feed's touched files are read once, not per exceptAll side)
    "lake_mor_delete" -> Seq("__dv_path,__dv_pos", "__dv_path,__dv_pos", "delete_cents,n_deletes,n_inserts", "delete_cents,n_deletes,n_inserts"),
    "lake_mor_merge" -> Seq("__dv_path,__dv_pos", "__dv_path,__dv_pos", "__dv_path,__dv_pos", "delete_cents,insert_cents,n_deletes,n_inserts"),
    "lake_restore" -> Seq("n_deletes,n_inserts,net_cents", "n_deletes,n_inserts,net_cents"),
    "lake_time_travel" -> Seq("delta_cents,delta_rows", "delta_cents,delta_rows", "delta_cents,delta_rows"),
    "link_rank" -> Seq("n", "n", "n", "n", "n", "n"),
    "mad_outliers" -> Seq("event_type,m2", "event_type,m2", "event_type,mad2", "event_type,n", "event_type,n", "event_type,n"),
    // the 1-row tie/total aggregate of the ≤31-row daily frame
    "mann_kendall" -> Seq("n_days,tsum"),
    "market_share" -> Seq("n_nationkey,n_regionkey", "r_regionkey", "sn_key,supp_nation"),
    "min_cost_supplier" -> Seq("n_name,n_nationkey", "r_regionkey"),
    "mixture_sample" -> Seq("permille,stratum"),
    "multimodal_pipeline" -> Seq("n_aud_ok", "n_dedup_removed", "n_img_ok", "n_survivors,sum_survivor_ids", "n_vid_ok"),
    "mrr_prec_at_k" -> Seq("df,term", "df,term", "n_docs", "n_docs", "qid,qq", "qid,qq"),
    "mv_refresh" -> Seq("cutoff", "cutoff"),
    // the 1-row day-count aggregate of the ≤31-row daily frame
    "page_hinkley" -> Seq("n_days"),
    "mv_refresh_join" -> Seq("cutoff", "cutoff", "cutoff", "cutoff", "cutoff", "cutoff", "cutoff", "cutoff"),
    "nation_volume" -> Seq("cust_nation,n_nationkey", "n_nationkey,supp_nation"),
    "percolate" -> Seq("n_terms,query_id", "query_id,term"),
    "phrase_detect" -> Seq("tb", "tu"),
    "pps_sample" -> Seq("lang,n_docs,w_tot"),
    "pq_codes" -> Seq("code_id,cq"),
    "pq_topk" -> Seq("adc_d2,vec_id", "code_id,cq", "code_id,qd2,subspace"),
    "pq_trained_topk" -> Seq("adc_d2,vec_id", "code_id,cq", "code_id,qd2,subspace"),
    "product_profit" -> Seq("n_name,n_nationkey"),
    "psi_drift" -> Seq("tmid", "tmid"),
    "quality_classifier" -> Seq("n_neg,n_pos", "neg_tot,pos_tot,v", "term,w_x1e6"),
    // fb = the ≤ 3-per-query feedback-doc ids (rank cut); df,term = the
    // ≤ |query terms| per-term df frame — both bounded by construction
    "query_expansion" -> Seq("doc_id,qid", "term"),
    "rag_pipeline" -> Seq("dense_ndcg_x1e6,fused_ndcg_x1e6,lex_ndcg_x1e6,query_id", "df,term", "n_chunks", "qid,qq"),
    "rag_rerank" -> Seq("query_id,rerank_ndcg_x1e6,stage1_ndcg_x1e6"),
    "retention_filter" -> Seq("cutoff"),
    // 1-row N (×3) + bounded bucket offsets (×3); the 1-row max-day
    // hint sits behind lf's localCheckpoint and never reaches the walk
    "rfm_segments" -> Seq("gbkt,goff", "gbkt,goff", "gbkt,goff",
      "nu", "nu", "nu"),
    "retrieval_ndcg" -> Seq("df,term", "df,term", "n_docs", "n_docs", "qid,qq", "qid,qq"),
    "returned_customers" -> Seq("n_name,n_nationkey"),
    "revenue_by_nation" -> Seq("n_name,n_nationkey,n_regionkey", "r_regionkey"),
    "rollup_agg" -> Seq("n_name,n_nationkey,n_regionkey", "r_name,r_regionkey"),
    "sales_opportunity" -> Seq("cnt,sm"),
    "seasonal_decompose" -> Seq("n_tot,sum_tot"),
    "semdedup" -> Seq("anchor_id,aq", "anchor_id,aq", "anchor_id,aq", "anchor_id,aq", "cluster,cn", "cluster,cn"),
    "simpson_audit" -> Seq("paradox"),
    "skew_report" -> Seq("total"),
    "skyline_frontier" -> Seq("gmax,price_cents"),
    "spearman_rho" -> Seq("gbkt,goff", "gbkt,goff"),
    "split_leakage" -> Seq("n_leaky_grouped,n_leaky_naive"),
    "survival_km" -> Seq("surv_x1e12,t"),
    "t_closeness" -> Seq("band,g", "nation,segment", "nb,nn"),
    // the 1-row pair-count aggregate of the ≤465-row slope frame
    "theil_sen" -> Seq("n_pairs"),
    "temp_mixture" -> Seq("lang,n_docs,wl", "wmin"),
    "textrank_keywords" -> Seq("n", "n", "n", "n", "n"),
    "tfidf_topk" -> Seq("n_docs"),
    "top_supplier" -> Seq("mx"),
    "trust_rank" -> Seq("ns", "ns", "ns", "ns", "ns", "ns"),
    "unigram_logprob" -> Seq("t_tokens"),
    "value_concentration" -> Seq("n,tot"),
    "vocab_coverage" -> Seq("is_top,term"),
    "zonemap_prune" -> Seq("clustered_wins"),
    "zscore_outliers" -> Seq("event_type,n,q,s")
  )

  /** One walk shared by both gates — building every registry DataFrame
    * also runs the eager fixture seams (localCheckpoint, lake), so do
    * it once. */
  private lazy val walked: Map[String, (Seq[String], Seq[String])] =
    SparkEntry.queries.map { case (name, q) =>
      val df = q(spark, sf)
      name -> (PlanSigs.unpartitionedWindowSigs(df),
        PlanSigs.broadcastHintSigs(df))
    }

  test("no registry query plans an unpartitioned Window off-whitelist") {
    val bad = walked.toSeq.sortBy(_._1).flatMap { case (name, (w, _)) =>
      val allowed = AllowedUnpartitionedWindows.getOrElse(name, Seq.empty)
      if (w == allowed.sorted) None
      else Some(s"$name: unpartitioned windows $w != whitelisted $allowed")
    }
    assert(bad.isEmpty,
      "unwhitelisted single-partition Window(s) — prove the frame is " +
        "bounded and whitelist it, or repartition the window:\n" +
        bad.mkString("\n"))
  }

  test("no registry query broadcast-hints a frame off-whitelist") {
    val bad = walked.toSeq.sortBy(_._1).flatMap { case (name, (_, b)) =>
      val allowed = AllowedBroadcastHints.getOrElse(name, Seq.empty)
      if (b == allowed.sorted) None
      else Some(s"$name: broadcast-hinted sides $b != whitelisted $allowed")
    }
    assert(bad.isEmpty,
      "unwhitelisted broadcast hint(s) — prove the hinted frame is " +
        "bounded and whitelist it, or drop the hint (size-based " +
        "planning still broadcasts small frames):\n" + bad.mkString("\n"))
  }

  test("whitelists reference only live registry queries") {
    val qs = SparkEntry.queries.keySet
    val stale = (AllowedUnpartitionedWindows.keySet ++
      AllowedBroadcastHints.keySet).diff(qs)
    assert(stale.isEmpty, s"whitelist entries for removed queries: $stale")
  }
}
