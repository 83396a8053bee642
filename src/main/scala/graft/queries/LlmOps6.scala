package graft.queries

import graft.core.Tables
import graft.llm.{Dedup, Similarity}
import graft.ops.Graphs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 LLM-pipeline additions: duplicate-CLUSTER extraction
  * (LSH pairs -> connected components -> canonical doc) and semantic
  * dedup / clustering over the embedding space (SemDeDup shape).
  */
object LlmOps6 {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  private def seeds(s: SparkSession, dir: String): Seq[(Long, Array[Double])] =
    Similarity.collectSeeds(T(s, dir)("embeddings"), "vec_id", "embedding",
      col("vec_id") < 8)

  val queries: Map[String, Q] = Map(
    // LSH near-dup PAIRS -> duplicate CLUSTERS via distributed connected
    // components (alternating large-star/small-star, O(log^2 n) rounds),
    // -> every document mapped to the canonical (minimum) id of its
    // cluster. Oracle: the exact-Jaccard pair set + a recursive-CTE
    // min-label closure in DuckDB.
    "q_dedup_components" -> { (s, dir) =>
      val docs = T(s, dir)("documents")
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        k = 32, bands = 8, shingleN = 3, threshold = 0.7)
      ordered(Graphs.canonicalAssignment(docs, "doc_id", pairs, "a", "b"))
    },

    // Connected components over a SECOND edge source — embedding cosine
    // near-dup pairs at the SEMANTIC-DUP threshold 0.9, over the corpus
    // plus two planted perturbations of each of the first 50 vectors
    // (the q_dedup_embedding_lsh construction, twice): each base vector
    // becomes a 3-node duplicate cluster whose canonical is the base id.
    // Edge generation is the BUCKETED path (band equi-join + exact
    // verify — no cartesian self-join, asserted in PlanSpec); the exact
    // quadratic pair set lives only in the oracle SQL. At cosine >= 0.9
    // the default 12x8 banding prunes ~99.6% of unrelated pairs — a LOW
    // threshold (like 0.45 on this near-orthogonal corpus) is
    // information-theoretically dense (nearly every pair collides in
    // some band) and belongs to the exact/verification path, not here.
    // CC is robust to a missed intra-cluster edge: the cluster stays
    // connected through the base vector, so the component assignment
    // still matches the exact-pair oracle closure.
    "q_semantic_components" -> { (s, dir) =>
      val base = T(s, dir)("embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val pert1 = base.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000L).as("vec_id"),
          concat(array(element_at(col("v"), 1) * 1.5), slice(col("v"), 2, 63)).as("v"))
      val pert2 = base.filter(col("vec_id") < 50)
        .select((col("vec_id") + 200000L).as("vec_id"),
          concat(slice(col("v"), 1, 1), array(element_at(col("v"), 2) * 1.5),
            slice(col("v"), 3, 62)).as("v"))
      val all = base.unionAll(pert1).unionAll(pert2)
      // nHint from parquet footer metadata (+100 planted perturbations)
      // — auto-banding stays live, sizing count() job skipped
      val n = graft.llm.LshDefaults.parquetRowHint(s, s"$dir/embeddings.parquet") + 100
      val pairs = Similarity.cosinePairsBucketed(all, "vec_id", "v", 0.9, nHint = n)
      ordered(Graphs.canonicalAssignment(all, "vec_id", pairs, "a", "b"))
    },

    // SemDeDup: cluster embeddings around 8 fixed seed vectors
    // (vec_id < 8 — reproducible on both engines), drop any vector with
    // a lower-id in-cluster near-duplicate at cosine >= 0.3.
    "q_semantic_dedup" -> { (s, dir) =>
      ordered(Similarity.semanticDedup(T(s, dir)("embeddings"),
        "vec_id", "embedding", seeds(s, dir), threshold = 0.3))
    },

    // Exact-substring duplication: token 8-gram spans present in >= 2
    // distinct documents (Lee et al. 2021 suffix-array dedup, n-gram
    // approximation). The groupBy is keyed on xxhash64(gram) — the
    // shuffle carries 16-byte (hash, id) rows, not the 8-word strings.
    "q_dup_ngram_spans" -> { (s, dir) =>
      ordered(Dedup.duplicateSpans(T(s, dir)("documents"), "doc_id", "text",
        n = 8, minDocs = 2))
    },

    // Perplexity-proxy quality scoring: self-trained token-bigram LM,
    // per-doc mean log-probability (the CCNet/KenLM filter shape).
    "q_lm_logprob" -> { (s, dir) =>
      ordered(graft.llm.Corpus.bigramLogProb(T(s, dir)("documents"),
        col("doc_id"), col("text")))
    },

    // Video-analog frame sampling: binary assets -> one row per sampled
    // frame (flatMap demuxer stub; real plumbing — see Multimodal).
    // Frames rendered as hex so both engines compare byte-exactly.
    "q_multimodal_frames" -> { (s, dir) =>
      val assets = graft.llm.Multimodal.assetsFromText(
        T(s, dir)("documents"), "doc_id", "text")
      val frames = graft.llm.Multimodal.sampleFrames(s, assets, 16, 32)
      ordered(frames.toDF().select(col("asset_id"), col("frame_idx"),
        hex(col("frame")).as("fhex")))
    },

    // Data-mixture budget: Hamilton largest-remainder apportionment of a
    // 1,000,003-token budget across sources by character mass — integer
    // allocations that sum exactly to the budget, exact DECIMAL(38,0)
    // arithmetic on both engines.
    "q_mixture_budget" -> { (s, dir) =>
      ordered(graft.llm.Corpus.apportionBudget(T(s, dir)("documents"),
        col("source"), col("n_chars"), 1000003L))
    },

    // One k-means Lloyd UPDATE step from the same fixed seeds: per-cell
    // population and mean of the first coordinate (the reduce side of
    // kmeansFit — partial sums per cell, never vectors).
    "q_cluster_stats" -> { (s, dir) =>
      val e = T(s, dir)("embeddings")
      val cells = e.select(
        Similarity.nearestSeed(col("embedding"), seeds(s, dir)).as("cell"),
        element_at(col("embedding").cast("array<double>"), 1).as("x1"))
      ordered(cells.groupBy("cell")
        .agg(count(lit(1)).as("n"), round(avg(col("x1")), 6).as("c1")))
    }
  )

  /** Shared oracle CTEs: double-cast vectors, the 8 seed vectors, and the
    * deterministic nearest-seed cell assignment (max cosine, lowest seed
    * on ties — row_number mirrors the Spark fold's strict compare). */
  private val assignCte =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |seeds AS (SELECT vec_id AS sid, v AS sv FROM e WHERE vec_id < 8),
      |scored AS (SELECT e.vec_id, e.v, s.sid,
      |    list_sum(list_transform(range(1, 65), i -> e.v[i] * s.sv[i]))
      |      / (sqrt(list_sum(list_transform(e.v, t -> t * t)))
      |         * sqrt(list_sum(list_transform(s.sv, t -> t * t)))) AS cos
      |  FROM e CROSS JOIN seeds s),
      |assign AS (SELECT vec_id, v, sid AS cell FROM (
      |    SELECT vec_id, v, sid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, sid) AS rn
      |    FROM scored) WHERE rn = 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_dedup_components" ->
      """WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |    ELSE [array_to_string(toks, ' ')] END AS g FROM d),
        |p AS (SELECT a, b FROM (
        |  SELECT x.doc_id AS a, y.doc_id AS b,
        |    len(list_intersect(x.g, y.g))::DOUBLE / len(list_distinct(x.g || y.g)) AS jaccard
        |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id)
        |  WHERE jaccard >= 0.7),
        |sym AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
        |walk(id, lbl) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT sym.b, w.lbl FROM walk w JOIN sym ON sym.a = w.id),
        |comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id)
        |SELECT doc_id AS id, coalesce(component, doc_id) AS canonical
        |FROM documents LEFT JOIN comp ON documents.doc_id = comp.id
        |ORDER BY id NULLS FIRST, canonical NULLS FIRST""".stripMargin,
    "q_dup_ngram_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 8 THEN
        |    list_transform(range(1, len(toks) - 6),
        |      i -> array_to_string(toks[i:i+7], ' '))
        |    ELSE []::VARCHAR[] END) AS gram FROM d)
        |SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
        |FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY gram NULLS FIRST, n_docs NULLS FIRST, n_occurrences NULLS FIRST""".stripMargin,
    "q_semantic_components" ->
      """WITH RECURSIVE base AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |e AS (SELECT vec_id, v FROM base
        |      UNION ALL
        |      SELECT vec_id + 100000, list_prepend(v[1] * 1.5, v[2:]) FROM base
        |      WHERE vec_id < 50
        |      UNION ALL
        |      SELECT vec_id + 200000, list_prepend(v[1], list_prepend(v[2] * 1.5, v[3:]))
        |      FROM base WHERE vec_id < 50),
        |p AS (SELECT a, b FROM (
        |  SELECT x.vec_id AS a, y.vec_id AS b,
        |    list_sum(list_transform(range(1, 65), i -> x.v[i] * y.v[i]))
        |      / (sqrt(list_sum(list_transform(x.v, t -> t * t)))
        |         * sqrt(list_sum(list_transform(y.v, t -> t * t)))) AS cos
        |  FROM e x JOIN e y ON x.vec_id < y.vec_id)
        |  WHERE cos >= 0.9),
        |sym AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
        |walk(id, lbl) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT sym.b, w.lbl FROM walk w JOIN sym ON sym.a = w.id),
        |comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id)
        |SELECT e.vec_id AS id, coalesce(component, e.vec_id) AS canonical
        |FROM e LEFT JOIN comp ON e.vec_id = comp.id
        |ORDER BY id NULLS FIRST, canonical NULLS FIRST""".stripMargin,
    "q_lm_logprob" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |p AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN
        |    list_transform(range(1, len(toks)), i -> {'w1': toks[i], 'w2': toks[i+1]})
        |    ELSE [] END) AS pr FROM d),
        |pairs AS (SELECT doc_id, pr.w1 AS w1, pr.w2 AS w2 FROM p),
        |bi AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
        |uni AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
        |model AS (SELECT bi.w1, bi.w2, ln(CAST(c12 AS DOUBLE) / c1) AS lp
        |  FROM bi JOIN uni ON bi.w1 = uni.w1)
        |SELECT doc_id AS id, round(avg(lp), 6) AS avg_logp, count(*) AS n_pairs
        |FROM pairs JOIN model ON pairs.w1 = model.w1 AND pairs.w2 = model.w2
        |GROUP BY doc_id
        |ORDER BY id NULLS FIRST, avg_logp NULLS FIRST, n_pairs NULLS FIRST""".stripMargin,
    "q_multimodal_frames" ->
      """WITH a AS (SELECT doc_id AS asset_id, text AS s FROM documents)
        |SELECT asset_id, CAST(f AS INT) AS frame_idx,
        |  hex(CAST(substring(s, 1 + f * 32, 16) AS BLOB)) AS fhex
        |FROM a, unnest(range(0, greatest((length(s) - 16) // 32 + 1, 0))) AS t(f)
        |ORDER BY asset_id NULLS FIRST, frame_idx NULLS FIRST, fhex NULLS FIRST""".stripMargin,
    "q_mixture_budget" ->
      """WITH w AS (SELECT source AS grp, CAST(sum(n_chars) AS HUGEINT) AS w
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM w),
        |s AS (SELECT grp, w, CAST(1000003 AS HUGEINT) * w AS bw, tw
        |  FROM w CROSS JOIN t),
        |sc AS (SELECT grp, w, bw // tw AS base, bw - (bw // tw) * tw AS rem, tw FROM s),
        |r AS (SELECT grp, w, base, rem,
        |    row_number() OVER (ORDER BY rem DESC, grp) AS rk,
        |    CAST(1000003 AS HUGEINT) - sum(base) OVER () AS leftover FROM sc)
        |SELECT grp, CAST(w AS BIGINT) AS w,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r
        |ORDER BY grp NULLS FIRST, w NULLS FIRST, alloc NULLS FIRST""".stripMargin,
    "q_semantic_dedup" ->
      s"""WITH $assignCte,
        |drops AS (SELECT DISTINCT y.vec_id AS id
        |  FROM assign x JOIN assign y ON x.cell = y.cell AND x.vec_id < y.vec_id
        |  WHERE list_sum(list_transform(range(1, 65), i -> x.v[i] * y.v[i]))
        |      / (sqrt(list_sum(list_transform(x.v, t -> t * t)))
        |         * sqrt(list_sum(list_transform(y.v, t -> t * t)))) >= 0.3)
        |SELECT a.vec_id AS id, a.cell, (d.id IS NULL) AS keep
        |FROM assign a LEFT JOIN drops d ON a.vec_id = d.id
        |ORDER BY id NULLS FIRST, cell NULLS FIRST, keep NULLS FIRST""".stripMargin,
    "q_cluster_stats" ->
      s"""WITH $assignCte
        |SELECT cell, count(*) AS n, round(avg(v[1]), 6) AS c1
        |FROM assign GROUP BY cell
        |ORDER BY cell NULLS FIRST, n NULLS FIRST, c1 NULLS FIRST""".stripMargin
  )
}
