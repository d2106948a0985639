package graft.queries

/** DuckDB oracle SQL — one entry per oracle-checkable query in
  * [[RelationalQueries]] / [[PipelineQueries]]. Each statement is the
  * EXACT semantic twin of its Spark query: same column names, same
  * DECIMAL casts before order-sensitive reductions, same rounding, same
  * total ORDER BY (NULLS FIRST to match Spark's ascending default).
  */
object Oracles {

  /** pipe01's verdict CTE chain (p0 → verdict), shared verbatim with the
    * pipe09 composition so the two oracles cannot drift. Programmatic:
    * the langid vote expressions mirror TextAnalysis.LangMarkers.
    */
  private val C4VerdictCtes: String = {
    val markers = Map(
      "de" -> Seq(" der ", " die ", " und ", " ist ", " das ", " ein "),
      "en" -> Seq(" the ", " and ", " of ", " is ", " to ", " in "),
      "es" -> Seq(" el ", " la ", " y ", " es ", " los ", " una "),
      "fr" -> Seq(" le ", " la ", " et ", " est ", " les ", " une "))
    val langs = markers.keys.toSeq.sorted
    def votes(l: String) = markers(l)
      .map(m => s"(length(p) - length(replace(p, '$m', ''))) / ${m.length}")
      .mkString(" + ")
    val voteCols = langs.map(l => s"${votes(l)} AS v_$l").mkString(",\n  ")
    val gmax = s"greatest(${langs.map("v_" + _).mkString(", ")})"
    val cases = langs.map(l => s"WHEN v_$l > 0 AND v_$l = $gmax THEN '$l'")
      .mkString(" ")
    s"""p0 AS (SELECT doc_id, text, ' ' || lower(text) || ' ' AS p FROM documents),
       |v AS (SELECT doc_id, text,
       |  $voteCols
       |FROM p0),
       |lp AS (SELECT doc_id, text, CASE $cases ELSE 'und' END AS lang_pred FROM v),
       |base AS (
       |  SELECT doc_id, lang_pred,
       |    length(text) AS nchar,
       |    len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS ntok,
       |    len(list_filter(string_split_regex(trim(text), '\\s+'),
       |      t -> lower(t) IN ('the','a','of','and','to','in','is','that','for','on',
       |                        'with','as','at','by','an','be','this'))) AS stophits,
       |    length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS punct,
       |    doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
       |  FROM lp
       |), scored AS (
       |  SELECT doc_id, lang_pred, ntok, is_duplicate,
       |    CASE WHEN ntok > 0 THEN CAST(nchar - (ntok - 1) AS DOUBLE) / ntok ELSE 0.0 END AS mwl,
       |    least(CAST(nchar AS DOUBLE) / 200.0, 1.0) AS len_score,
       |    least(CAST(stophits AS DOUBLE) * 10.0 / greatest(ntok, 1), 1.0) AS stop_score,
       |    1.0 - least(CAST(punct AS DOUBLE) * 20.0 / greatest(nchar, 1), 1.0) AS punct_score
       |  FROM base
       |), fin AS (
       |  SELECT doc_id, lang_pred, CAST(ntok AS INT) AS n_tokens,
       |    round(len_score * 0.3 + stop_score * 0.2 + punct_score * 0.3 +
       |      (CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2, 4) AS quality,
       |    is_duplicate
       |  FROM scored
       |), verdict AS (
       |  SELECT doc_id, lang_pred, n_tokens, quality, is_duplicate,
       |    CASE WHEN is_duplicate THEN 'duplicate'
       |         WHEN n_tokens < 5 THEN 'too_short'
       |         WHEN n_tokens > 5000 THEN 'too_long'
       |         WHEN quality < 0.55 THEN 'low_quality'
       |         WHEN lang_pred NOT IN ('de','en','es','fr') THEN 'lang'
       |         ELSE '' END AS reject_reason
       |  FROM fin)""".stripMargin
  }


  /** The Md5 hash family's seeded hash as DuckDB SQL (HashFamily.Md5:
    * Kirsch–Mitzenmacher double hashing — ONE md5 per value split into
    * two 48-bit halves, seed j's hash = h1 + j·h2; max < 2^55, exact
    * BIGINT math in both engines). `vh1`/`vh2` are the halves of
    * `md5(valueExpr)`.
    */
  private def md5h1(valueExpr: String): String =
    s"CAST('0x' || substr(md5($valueExpr), 1, 12) AS BIGINT)"
  private def md5h2(valueExpr: String): String =
    s"CAST('0x' || substr(md5($valueExpr), 13, 12) AS BIGINT)"

  /** The full MinHash → LSH-bands → candidate-join → exact-Jaccard
    * pipeline under the Md5 hash family, twinning
    * Dedup.minhashNearDups(tau = 0.3) value-for-value: the dd05
    * tokenizer/shingler CTEs, per-shingle h1/h2, 64 signature mins
    * (min of h1 + j·h2), 16 band hashes over 4-wide signature slices
    * (double hashing of the comma-joined slice, seed = band index),
    * distinct candidate pairs, exact Jaccard on candidates. Shared
    * VERBATIM by dd03 (inline pipeline) and dd10 (committed band
    * index) — band rows are per-doc independent, so build+append over
    * the whole corpus produces exactly the inline bands, and one oracle
    * hard-proves both plus committed ≡ inline.
    */
  private val MinHashLshCtes: String = {
    val numHashes = 64
    val bands = 16
    val rpb = numHashes / bands
    val minCols = (0 until numHashes)
      .map(j => s"min((h1 + $j * h2) % 2147483647) AS h$j")
      .mkString(",\n    ")
    val bandSelects = (0 until bands).map { b =>
      val joined = (0 until rpb)
        .map(r => s"CAST(h${b * rpb + r} AS VARCHAR)").mkString(" || ',' || ")
      s"""SELECT doc_id, $b AS band,
         |    ${md5h1("m")} + $b * ${md5h2("m")} AS band_hash
         |  FROM (SELECT doc_id, $joined AS m FROM sigs)""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim(text)), '\\W+'), t -> t <> '') AS tk
       |  FROM documents
       |), shl AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
       |      ELSE list_transform(range(len(tk) - 2), i -> array_to_string(tk[i+1:i+3], ' '))
       |    END) AS shingles
       |  FROM toks
       |), e AS (
       |  SELECT doc_id, unnest(shingles) AS s FROM shl
       |), hh AS (
       |  SELECT doc_id, s, ${md5h1("s")} AS h1, ${md5h2("s")} AS h2 FROM e
       |), sigs AS (
       |  SELECT doc_id,
       |    $minCols
       |  FROM hh GROUP BY doc_id
       |), bd AS (
       |  $bandSelects
       |), cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bd a JOIN bd b
       |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), sizes AS (
       |  SELECT doc_id, count(*) AS sz FROM e GROUP BY 1
       |), inter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS i
       |  FROM cand c
       |  JOIN e ea ON ea.doc_id = c.id_a
       |  JOIN e eb ON eb.doc_id = c.id_b AND eb.s = ea.s
       |  GROUP BY 1, 2
       |), vpairs AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(coalesce(i.i, 0) AS DOUBLE) / (sa.sz + sb.sz - coalesce(i.i, 0)) AS jac
       |  FROM cand c
       |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |  JOIN sizes sa ON sa.doc_id = c.id_a
       |  JOIN sizes sb ON sb.doc_id = c.id_b
       |)""".stripMargin
  }

  private val MinHashLshPairsSql: String =
    s"""WITH $MinHashLshCtes
       |SELECT id_a, id_b, round(jac, 4) AS jaccard
       |FROM vpairs WHERE jac >= 0.3 ORDER BY id_a, id_b""".stripMargin

  /** The Md5 family's hyperplane component for plane `p`, dim expr `i0`
    * (0-based): h1 of md5("p:i0") mapped to [-1, 1) — exact IEEE double
    * ops both engines reproduce (2^47 = 140737488355328 is an exact
    * double).
    */
  private def planeSql(p: String, i0: String): String =
    s"${md5h1(s"CAST($p AS VARCHAR) || ':' || CAST($i0 AS VARCHAR)")}" +
      s" / 140737488355328.0 - 1.0"

  /** Left-fold dot product of `vec` with plane `p` — DuckDB's
    * list_reduce reproduces Spark's aggregate(zip_with(...)) double-add
    * sequence bit-for-bit (dd07 precedent; the leading +0.0 is exact),
    * so the d > 0 sign decisions agree exactly. DuckDB lambda index `i`
    * is 1-based; Spark's sequence(0, n-1) is 0-based, hence i-1.
    */
  private def planeDotSql(vec: String, p: String): String =
    s"list_reduce(list_transform($vec, (x, i) -> " +
      s"CAST(x AS DOUBLE) * (${planeSql(p, "i - 1")})), (a, b) -> a + b)"

  /** Packed hyperplane bucket over planes p = base..base+nBits-1. */
  private def bucketSql(vec: String, base: Int, nBits: Int): String =
    (0 until nBits).map { j =>
      s"(CASE WHEN ${planeDotSql(vec, (base + j).toString)} > 0" +
        s" THEN (1::BIGINT << $j) ELSE 0 END)"
    }.mkString(" | ")

  /** Exact left-fold cosine (dd07 precedent). */
  private def cosSql(u: String, v: String): String = {
    def dot(a: String, b: String) =
      s"list_reduce(list_transform(list_zip($a, $b), " +
        s"q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)), (x, y) -> x + y)"
    s"(${dot(u, v)} / (sqrt(${dot(u, u)}) * sqrt(${dot(v, v)})))"
  }

  /** The Md5-family deterministic Lloyd quantizer (8 clusters, 2
    * iterations) + inverted lists, twinning Similarity.kmeansCentroids /
    * assignToCentroids value-for-value:
    *   - init: the 8 vectors with the smallest (h1(md5(id)), id) — the
    *     seeded, partitioning-free pick; cluster_id = rank − 1;
    *   - assignment: argmin of (1.0 − round(cos, 9), cluster_id) — the
    *     exact expression the Spark min_by orders by;
    *   - means: fixed-point micro-units — sum(floor(x·10^6)::BIGINT) per
    *     (cluster, pos) divided as doubles — integer sums are
    *     order-independent and the one double division is IEEE-identical
    *     (the Md5 family's mean arithmetic; production keeps DECIMAL);
    *   - empty clusters keep their previous centroid (LEFT JOIN +
    *     coalesce).
    * Produces CTEs: emb (double vectors), c2 (final centroids), idx
    * (inverted lists nn_id/nn_vec/cluster_id).
    */
  private val KmeansCtes: String = {
    def assign(cents: String, out: String): String =
      s"""$out AS (
         |  SELECT vec_id, v, cluster_id FROM (
         |    SELECT e.vec_id, e.v, c.cluster_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY 1.0 - round(${cosSql("e.v", "c.cvec")}, 9), c.cluster_id) AS rn
         |    FROM emb e CROSS JOIN $cents c)
         |  WHERE rn = 1)""".stripMargin
    def means(asg: String, out: String): String =
      s"""$out AS (
         |  SELECT cluster_id, list(m ORDER BY pos) AS cvec FROM (
         |    SELECT cluster_id, pos,
         |      CAST(sum(CAST(floor(x * 1000000.0) AS BIGINT)) AS DOUBLE)
         |        / CAST(count(*) AS DOUBLE) / 1000000.0 AS m
         |    FROM (SELECT cluster_id, unnest(v) AS x,
         |            generate_subscripts(v, 1) AS pos FROM $asg)
         |    GROUP BY 1, 2)
         |  GROUP BY 1)""".stripMargin
    def next(prev: String, m: String, out: String): String =
      s"""$out AS (
         |  SELECT p.cluster_id, coalesce(mm.cvec, p.cvec) AS cvec
         |  FROM $prev p LEFT JOIN $m mm ON mm.cluster_id = p.cluster_id)""".stripMargin
    s"""emb AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), c0 AS (
       |  SELECT row_number() OVER (ORDER BY hk, vec_id) - 1 AS cluster_id, v AS cvec
       |  FROM (SELECT vec_id, v, ${md5h1("CAST(vec_id AS VARCHAR)")} AS hk FROM emb)
       |  ORDER BY hk, vec_id LIMIT 8
       |), ${assign("c0", "a1")},
       |${means("a1", "m1")},
       |${next("c0", "m1", "c1")},
       |${assign("c1", "a2")},
       |${means("a2", "m2")},
       |${next("c1", "m2", "c2")},
       |${assign("c2", "a3")},
       |idx AS (
       |  SELECT vec_id AS nn_id, v AS nn_vec, cluster_id FROM a3)""".stripMargin
  }

  /** ann03's full SQL (probe nProbe = 2 of 8, top-5) — shared verbatim
    * with ann04 (committed index ≡ inline by construction).
    */
  private val IvfTopKSql: String =
    s"""WITH $KmeansCtes,
       |qp AS (
       |  SELECT query_id, q_vec, cluster_id FROM (
       |    SELECT e.vec_id AS query_id, e.v AS q_vec, c.cluster_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY round(${cosSql("e.v", "c.cvec")}, 9) DESC, c.cluster_id ASC) AS pr
       |    FROM emb e CROSS JOIN c2 c WHERE e.vec_id < 10)
       |  WHERE pr <= 2
       |), sc AS (
       |  SELECT qp.query_id, ix.nn_id,
       |    round(${cosSql("qp.q_vec", "ix.nn_vec")}, 6) AS score
       |  FROM idx ix JOIN qp ON ix.cluster_id = qp.cluster_id
       |  WHERE qp.query_id <> ix.nn_id
       |), ranked AS (
       |  SELECT query_id, nn_id, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, nn_id ASC) AS rank
       |  FROM sc)
       |SELECT query_id, nn_id, score, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  val all: Map[String, String] = Map(
    // dd02: Md5 MinHash signature prefix — first 4 of the 64
    // signature mins (Spark computes 64 then slices; min-of-seed-j is
    // independent per j, so computing just the 4 output slots is
    // identical), joined with ',' exactly like the Spark side.
    "dd02_minhash_signature" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(text)), '\\W+'), t -> t <> '') AS tk
         |  FROM documents
         |), shl AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         |      ELSE list_transform(range(len(tk) - 2), i -> array_to_string(tk[i+1:i+3], ' '))
         |    END) AS shingles
         |  FROM toks
         |), e AS (SELECT doc_id, unnest(shingles) AS s FROM shl
         |), hh AS (
         |  SELECT doc_id, ${md5h1("s")} AS h1, ${md5h2("s")} AS h2 FROM e)
         |SELECT doc_id,
         |  CAST(min(h1 % 2147483647) AS VARCHAR) || ',' ||
         |  CAST(min((h1 + h2) % 2147483647) AS VARCHAR) || ',' ||
         |  CAST(min((h1 + 2 * h2) % 2147483647) AS VARCHAR) || ',' ||
         |  CAST(min((h1 + 3 * h2) % 2147483647) AS VARCHAR) AS sig_prefix
         |FROM hh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dd03_minhash_lsh_pairs" -> MinHashLshPairsSql,

    // dd04: Md5 SimHash — 64 ±1 bit votes per token hash (h1's 48 bits +
    // h2's low 16), packed signature (bit 63 = the min-long literal:
    // DuckDB's << errors on 1<<63), 16-bit chunk blocking, exact Hamming
    // via bit_count(xor) — two's-complement in both engines.
    "dd04_simhash_pairs" -> {
      val votes = (0 until 64).map { j =>
        val bit = if (j < 48) s"(h1 >> $j) & 1" else s"(h2 >> ${j - 48}) & 1"
        s"sum(CASE WHEN ($bit) = 1 THEN 1 ELSE -1 END) AS b$j"
      }.mkString(",\n    ")
      val pack = (0 until 64).map { j =>
        val term = if (j == 63) "-9223372036854775808" else s"(1::BIGINT << $j)"
        s"(CASE WHEN b$j > 0 THEN $term ELSE 0 END)"
      }.mkString(" | ")
      s"""WITH t AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split_regex(lower(trim(text)), '\\W+'), x -> x <> '')) AS tok
         |  FROM documents
         |), hh AS (
         |  SELECT doc_id, ${md5h1("tok")} AS h1, ${md5h2("tok")} AS h2 FROM t
         |), v AS (
         |  SELECT doc_id,
         |    $votes
         |  FROM hh GROUP BY doc_id
         |), sig AS (
         |  SELECT doc_id, $pack AS simhash FROM v
         |), ch AS (
         |  SELECT doc_id, simhash, c AS chunk, (simhash >> (16 * c)) & 65535 AS chunk_val
         |  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS c)
         |), pr AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |  FROM ch a JOIN ch b
         |    ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3)
         |SELECT id_a, id_b, hamming FROM pr
         |WHERE hamming <= 8 ORDER BY id_a, id_b""".stripMargin
    },

    // dd06: Md5 hyperplane LSH near-dups — 4 bands × 4-bit buckets
    // (plane base = band·1024, the Spark side's seed fold), candidate
    // union, exact-cosine verify at tau = 0.4.
    "dd06_embed_neardups" -> {
      val buckets = (0 until 4)
        .map(b => s"${bucketSql("embedding", b * 1024, 4)} AS bucket_$b")
        .mkString(",\n    ")
      val bandJoins = (0 until 4).map { b =>
        s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM sg a JOIN sg b ON a.bucket_$b = b.bucket_$b AND a.vec_id < b.vec_id""".stripMargin
      }.mkString("\n  UNION ALL ")
      s"""WITH sg AS (
         |  SELECT vec_id, embedding,
         |    $buckets
         |  FROM embeddings
         |), cand AS (
         |  SELECT DISTINCT id_a, id_b FROM (
         |  $bandJoins)
         |), sc AS (
         |  SELECT c.id_a, c.id_b, round(${cosSql("ea.embedding", "eb.embedding")}, 6) AS cos
         |  FROM cand c
         |  JOIN embeddings ea ON ea.vec_id = c.id_a
         |  JOIN embeddings eb ON eb.vec_id = c.id_b)
         |SELECT id_a, id_b, cos FROM sc WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin
    },

    "ann03_ivf_topk" -> IvfTopKSql,

    // ann04 = ann03's SQL verbatim: the committed index's probe over
    // build (same family) is row-identical to the inline ivfTopK —
    // shared assign/probe plans; one oracle hard-proves both.
    "ann04_ivf_committed" -> IvfTopKSql,

    // dd08: SemDeDup — ann03's k-means CTEs verbatim, then the
    // within-cluster smaller-id pruning: every vector keeps unless a
    // smaller-id same-cluster neighbor has cosine ≥ 0.95.
    "dd08_semdedup" ->
      s"""WITH $KmeansCtes,
         |l AS (
         |  SELECT a.nn_id AS id_a, min(b.nn_id) AS dup_of
         |  FROM idx a JOIN idx b
         |    ON a.cluster_id = b.cluster_id AND b.nn_id < a.nn_id
         |   AND round(${cosSql("a.nn_vec", "b.nn_vec")}, 6) >= 0.95
         |  GROUP BY 1)
         |SELECT i.nn_id AS vec_id, i.cluster_id, l.dup_of,
         |  l.dup_of IS NULL AS kept
         |FROM idx i LEFT JOIN l ON l.id_a = i.nn_id
         |ORDER BY vec_id""".stripMargin,

    // ann02: Md5 hyperplane LSH top-5 — one 6-bit signature, bucket
    // equi-join, exact cosine, (score DESC, nn_id ASC) ranking (the
    // two-phase salted top-k is result-identical to the single window —
    // ann01's oracle pins the ranking convention).
    "ann02_lsh_topk" ->
      s"""WITH sg AS (
         |  SELECT vec_id, embedding, ${bucketSql("embedding", 0, 6)} AS bucket
         |  FROM embeddings
         |), sc AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
         |    round(${cosSql("q.embedding", "c.embedding")}, 6) AS score
         |  FROM sg q JOIN sg c ON q.bucket = c.bucket
         |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
         |), ranked AS (
         |  SELECT query_id, nn_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, nn_id ASC) AS rank
         |  FROM sc)
         |SELECT query_id, nn_id, score, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // ann05: multi-table Md5 hyperplane LSH top-5 — 8 independent 6-bit
    // signatures (plane base t*1024, the bandSignature convention dd06
    // pins), candidates unioned across tables and deduped BEFORE scoring
    // (identical vectors ⇒ identical score, so the dedup is
    // value-deterministic), then ann02's exact-cosine ranking verbatim.
    "ann05_lsh_multitable" -> {
      val buckets = (0 until 8)
        .map(t => s"${bucketSql("embedding", t * 1024, 6)} AS bucket_$t")
        .mkString(",\n    ")
      val tableJoins = (0 until 8).map { t =>
        s"""SELECT q.vec_id AS query_id, c.vec_id AS nn_id
           |  FROM sg q JOIN sg c ON q.bucket_$t = c.bucket_$t
           |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id""".stripMargin
      }.mkString("\n  UNION ALL ")
      s"""WITH sg AS (
         |  SELECT vec_id, embedding,
         |    $buckets
         |  FROM embeddings
         |), cand AS (
         |  SELECT DISTINCT query_id, nn_id FROM (
         |  $tableJoins)
         |), sc AS (
         |  SELECT cand.query_id, cand.nn_id,
         |    round(${cosSql("q.embedding", "c.embedding")}, 6) AS score
         |  FROM cand
         |  JOIN embeddings q ON q.vec_id = cand.query_id
         |  JOIN embeddings c ON c.vec_id = cand.nn_id
         |), ranked AS (
         |  SELECT query_id, nn_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, nn_id ASC) AS rank
         |  FROM sc)
         |SELECT query_id, nn_id, score, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },

    // dd10 = dd03's SQL verbatim: the committed index's nearDups over
    // build(⅔)+append(⅓) is row-identical to the inline pipeline (band
    // rows are per-doc independent), so the same oracle pins BOTH the
    // pipeline values and the committed ≡ inline contract.
    "dd10_minhash_committed" -> MinHashLshPairsSql,

    // dd11: the end-to-end composition — the Md5 pair CTEs verbatim
    // (tau 0.3, same as dd03), then dd09's recursive-CTE transitive
    // closure over every document id; component = min reachable id,
    // singletons label themselves.
    "dd11_text_dup_clusters" ->
      s"""WITH RECURSIVE $MinHashLshCtes,
         |p AS (SELECT id_a, id_b FROM vpairs WHERE jac >= 0.3),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM p
         |  UNION
         |  SELECT id_b AS src, id_a AS dst FROM p),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS r FROM documents
         |  UNION
         |  SELECT reach.id, ed.dst AS r FROM reach JOIN edges ed ON ed.src = reach.r),
         |lbl AS (
         |  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY 1)
         |SELECT doc_id, component,
         |  count(*) OVER (PARTITION BY component) AS cluster_size,
         |  doc_id = component AS is_keeper
         |FROM lbl ORDER BY doc_id""".stripMargin,

    // ta04: Md5 winnowing — word hash = seed-0 RANK hash (h1 of the
    // token's md5, mod 2^31−1), window-4 minima, digest = seed-1
    // equality hash of the comma-joined sorted distinct minima.
    "ta04_fingerprint" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS tk
         |  FROM documents
         |), h AS (
         |  SELECT doc_id,
         |    list_transform(tk, t -> ${md5h1("t")} % 2147483647) AS hs FROM toks
         |), m AS (
         |  SELECT doc_id, CASE WHEN len(hs) = 0 THEN hs
         |    ELSE list_transform(range(greatest(len(hs) - 3, 1)),
         |      i -> list_min(hs[i+1:i+4])) END AS mins
         |  FROM h
         |), j AS (
         |  SELECT doc_id,
         |    array_to_string(list_transform(list_sort(list_distinct(mins)),
         |      x -> CAST(x AS VARCHAR)), ',') AS fp
         |  FROM m
         |)
         |SELECT doc_id, ${md5h1("fp")} + ${md5h2("fp")} AS fp_hash
         |FROM j ORDER BY doc_id""".stripMargin,

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q03_topk_orders" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM orders ORDER BY total DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q04_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q06_window_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q07_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(cur - prev_price AS DOUBLE) AS price_delta
        |FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS cur,
        |    lag(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_price
        |  FROM orders)
        |WHERE prev_price IS NOT NULL
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q08_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, running_qty FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |      PARTITION BY l_suppkey
        |      ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |  FROM lineitem)
        |WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q09_distinct_pairs" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem ORDER BY 1, 2""".stripMargin,

    "q10_set_ops" ->
      """SELECT
        |  (SELECT count(*) FROM (
        |     SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |     UNION SELECT o_custkey FROM orders)) AS union_cnt,
        |  (SELECT count(*) FROM (
        |     SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |     EXCEPT SELECT o_custkey FROM orders)) AS except_cnt,
        |  (SELECT count(*) FROM (
        |     SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |     INTERSECT SELECT o_custkey FROM orders)) AS intersect_cnt""".stripMargin,

    "q11_group_having" ->
      """SELECT o_custkey, count(*) AS n_orders
        |FROM orders GROUP BY 1 HAVING count(*) > 15
        |ORDER BY o_custkey""".stripMargin,

    "q12_argmax_per_group" ->
      """SELECT c_nationkey, top_custkey, top_acctbal FROM (
        |  SELECT c_nationkey, c_custkey AS top_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS top_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer)
        |WHERE rn = 1 ORDER BY c_nationkey""".stripMargin,

    "q13_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(GROUPING(r_name, n_name) AS INT) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q14_json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_val
        |FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |ORDER BY event_id LIMIT 500""".stripMargin,

    "q15_date_trunc_agg" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q16_conditional_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN value > 10 THEN CAST(value AS DECIMAL(18,2))
        |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS big_value_sum,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q17_regex_match" ->
      """SELECT doc_id,
        |  regexp_matches(text, '\bspark\b') AS mentions_spark,
        |  regexp_extract(text, '\b(join|window|shuffle)\b', 1) AS first_op
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q18_broadcast_join" ->
      """SELECT n_name, count(*) AS n_suppliers,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q19_union_distinct_agg" ->
      """SELECT nationkey, count(*) AS n_parties FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q20_time_window_agg" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q21_correlated_subquery" ->
      """SELECT o_custkey, count(*) AS n_above_avg
        |FROM orders o
        |WHERE o_totalprice > (SELECT avg(o2.o_totalprice)
        |                      FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q22_scalar_subquery" ->
      """SELECT c_mktsegment, count(*) AS n_rich
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // ------------------------------------------------ pipeline oracles

    "dd01_exact_dups" ->
      """SELECT doc_id, md5(text) AS content_hash,
        |  count(*) OVER (PARTITION BY md5(text)) AS dup_count,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id,
        |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
        |FROM documents ORDER BY doc_id""".stripMargin,

    // exact cosine pairs: list_reduce's left fold reproduces Spark's
    // aggregate(zip_with(...)) double-add sequence bit-for-bit (the
    // leading +0.0 in Spark's fold is exact), so round(,6) agrees
    "dd07_embed_exact_pairs" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_reduce(list_transform(list_zip(a.embedding, b.embedding),
        |      q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)), (x, y) -> x + y)
        |      / (a.nrm * b.nrm) AS c
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(c, 6) AS cos FROM p
        |WHERE c >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    // dd09: the dd07 pair set (exact cosine ≥ 0.4 — oracle-green twin)
    // consolidated into connected components by a recursive CTE: reach =
    // transitive closure from each node, component = min reachable id.
    // Exactly the spec the Spark side's large-star/small-star computes.
    "dd09_dup_clusters" ->
      """WITH RECURSIVE n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id
        |  WHERE list_reduce(list_transform(list_zip(a.embedding, b.embedding),
        |      q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)), (x, y) -> x + y)
        |      / (a.nrm * b.nrm) >= 0.4),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION
        |  SELECT id_b AS src, id_a AS dst FROM p),
        |reach AS (
        |  SELECT vec_id AS id, vec_id AS r FROM embeddings
        |  UNION
        |  SELECT reach.id, e.dst AS r FROM reach JOIN edges e ON e.src = reach.r),
        |lbl AS (
        |  SELECT id AS vec_id, min(r) AS component FROM reach GROUP BY 1)
        |SELECT vec_id, component,
        |  count(*) OVER (PARTITION BY component) AS cluster_size,
        |  vec_id = component AS is_keeper
        |FROM lbl ORDER BY vec_id""".stripMargin,

    "dd05_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, source,
        |    list_filter(string_split_regex(lower(trim(text)), '\W+'), t -> t <> '') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, lang, source,
        |    list_distinct(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_transform(range(len(tk) - 2), i -> array_to_string(tk[i+1:i+3], ' '))
        |    END) AS shingles
        |  FROM toks
        |), e AS (
        |  SELECT doc_id, lang, source, unnest(shingles) AS s FROM sh
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM e GROUP BY 1
        |), pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM e a JOIN e b
        |    ON a.lang = b.lang AND a.source = b.source AND a.s = b.s
        |   AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT p.id_a, p.id_b, p.i, sa.sz AS sz_a, sb.sz AS sz_b,
        |  round(CAST(p.i AS DOUBLE) / (sa.sz + sb.sz - p.i), 6) AS jaccard
        |FROM pairs p
        |JOIN sizes sa ON sa.doc_id = p.id_a
        |JOIN sizes sb ON sb.doc_id = p.id_b
        |WHERE CAST(p.i AS DOUBLE) / (sa.sz + sb.sz - p.i) >= 0.03
        |ORDER BY id_a, id_b""".stripMargin,

    // dd12: duplicate-span removal — window hashes under the Md5 family
    // at seed 0 reduce to the h1 half of md5(window), so DuckDB replays
    // the whole pipeline (tokens → k-windows → global count ≥ 2 →
    // coverage → index-lambda rebuild) value-for-value. DuckDB list
    // slices are 1-based INCLUSIVE and filter-lambda indexes are
    // 1-based (hence i - 1).
    "dd12_dup_span_removal" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(text)), '\\W+'), t -> t <> '') AS tk
         |  FROM documents
         |), wins AS (
         |  SELECT doc_id,
         |    unnest(range(len(tk) - 7)) AS wpos,
         |    unnest(list_transform(range(len(tk) - 7),
         |      i -> ${md5h1("array_to_string(tk[i+1:i+8], ' ')")})) AS wh
         |  FROM toks WHERE len(tk) >= 8
         |), dup AS (
         |  SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2
         |), cov AS (
         |  SELECT DISTINCT w.doc_id, w.wpos + offs.o AS cpos
         |  FROM wins w JOIN dup USING (wh)
         |  CROSS JOIN (SELECT unnest(range(8)) AS o) offs
         |), covagg AS (
         |  SELECT doc_id, count(*) AS n_removed, list(cpos) AS cps
         |  FROM cov GROUP BY doc_id
         |)
         |SELECT t.doc_id, CAST(len(tk) AS INT) AS n_tokens,
         |  CAST(coalesce(c.n_removed, 0) AS INT) AS n_removed,
         |  coalesce(array_to_string(list_filter(tk,
         |    (x, i) -> NOT coalesce(list_contains(c.cps, i - 1), false)), ' '), '') AS kept_text
         |FROM toks t LEFT JOIN covagg c USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // ann06: affine int8 quantization — float→double casts are exact,
    // the scale division / code rounding are single correctly-rounded
    // IEEE ops, so codes match bit-for-bit; constant vectors hit the
    // scale-0 branch.
    "ann06_int8_quant" ->
      """SELECT vec_id,
        |  round(CAST(list_min(embedding) AS DOUBLE), 6) AS mn,
        |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS mx,
        |  CASE WHEN list_min(embedding) = list_max(embedding)
        |    THEN list_transform(embedding, x -> 0)
        |    ELSE list_transform(embedding, x -> CAST(floor(
        |      (CAST(x AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE))
        |        / ((CAST(list_max(embedding) AS DOUBLE)
        |            - CAST(list_min(embedding) AS DOUBLE)) / 255.0)
        |      + 0.5) AS INT))
        |  END AS codes
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "ann01_topk_bruteforce" ->
      """WITH u AS (
        |  SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
        |  FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
        |  FROM u GROUP BY 1
        |), dots AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
        |    sum(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)) AS dp
        |  FROM u q JOIN u c ON q.i = c.i
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT query_id, nn_id,
        |    round(dp / (nq.nrm * nc.nrm), 6) AS score
        |  FROM dots
        |  JOIN norms nq ON nq.vec_id = query_id
        |  JOIN norms nc ON nc.vec_id = nn_id
        |), ranked AS (
        |  SELECT query_id, nn_id, score,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, nn_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, nn_id, score, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // pipe01: quality (ta02's formulas) + langid (ta03's vote CASE) +
    // exact-dup window (dd01's md5 partition) composed into the same
    // first-failing reject_reason Spark computes
    "pipe01_c4_filter" ->
      s"""WITH ${C4VerdictCtes}
         |SELECT doc_id, lang_pred, n_tokens, quality, is_duplicate,
         |  reject_reason, reject_reason = '' AS kept
         |FROM verdict ORDER BY doc_id""".stripMargin,

    // pipe09: the full curation composition — pipe01's verdict CTEs
    // verbatim, kept rows only, then pipe07's md5 shuffle assignment
    // recomputed over the kept population (matching the Spark side,
    // which shuffles the FILTERED set).
    "pipe09_curation_pipeline" ->
      s"""WITH ${C4VerdictCtes},
         |kept AS (
         |  SELECT doc_id, lang_pred, quality FROM verdict WHERE reject_reason = ''),
         |k AS (
         |  SELECT doc_id, lang_pred, quality,
         |    md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
         |  FROM kept)
         |SELECT doc_id, lang_pred, quality,
         |  CAST(strpos('0123456789abcdef', substr(shuffle_key, 1, 1)) - 1 AS INT) AS shard,
         |  CAST(row_number() OVER (
         |    PARTITION BY strpos('0123456789abcdef', substr(shuffle_key, 1, 1))
         |    ORDER BY shuffle_key, doc_id) AS INT) AS pos
         |FROM k ORDER BY doc_id""".stripMargin,

    // quality CTE = ta02's formulas; cume_dist has identical SQL-standard
    // tie semantics in both engines; kept uses the ROUNDED percentile in
    // both (same boundary)
    "pipe05_quality_percentile" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    length(text) AS nchar,
        |    len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS ntok,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> lower(t) IN ('the','a','of','and','to','in','is','that','for','on',
        |                        'with','as','at','by','an','be','this'))) AS stophits,
        |    length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS punct
        |  FROM documents
        |), scored AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN ntok > 0 THEN CAST(nchar - (ntok - 1) AS DOUBLE) / ntok ELSE 0.0 END AS mwl,
        |    least(CAST(nchar AS DOUBLE) / 200.0, 1.0) AS len_score,
        |    least(CAST(stophits AS DOUBLE) * 10.0 / greatest(ntok, 1), 1.0) AS stop_score,
        |    1.0 - least(CAST(punct AS DOUBLE) * 20.0 / greatest(nchar, 1), 1.0) AS punct_score
        |  FROM base
        |), q AS (
        |  SELECT doc_id, lang,
        |    round(len_score * 0.3 + stop_score * 0.2 + punct_score * 0.3 +
        |      (CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2, 4) AS quality
        |  FROM scored)
        |SELECT doc_id, lang, quality,
        |  round(cume_dist() OVER (PARTITION BY lang ORDER BY quality), 6) AS q_pct,
        |  round(cume_dist() OVER (PARTITION BY lang ORDER BY quality), 6) > 0.6 AS kept
        |FROM q ORDER BY doc_id""".stripMargin,

    "pipe02_sample_stratified" ->
      """SELECT doc_id, lang,
        |  substring(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 4) AS sample_key,
        |  CASE WHEN lang = 'en' THEN '8000' ELSE '4000' END AS threshold,
        |  substring(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 4) <
        |    CASE WHEN lang = 'en' THEN '8000' ELSE '4000' END AS kept
        |FROM documents ORDER BY doc_id""".stripMargin,

    // block = doc_id div 2^20 (the scale-out window key; packs never
    // span blocks); pack_id = block << 32 | within-block bin
    "pipe03_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS INT) AS n_tokens,
        |    CAST(floor(CAST(doc_id AS BIGINT) / 1048576.0) AS BIGINT) AS block
        |  FROM documents)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY lang, block ORDER BY doc_id) AS BIGINT) AS cum_tokens,
        |  (block << 32) | CAST(floor((CAST(sum(n_tokens) OVER (PARTITION BY lang, block ORDER BY doc_id) AS BIGINT)
        |    - n_tokens) / 512.0) AS BIGINT) AS pack_id
        |FROM t ORDER BY doc_id""".stripMargin,

    "pipe04_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\W+'), t -> t <> '') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_transform(range(len(tk) - 2), i -> array_to_string(tk[i+1:i+3], ' '))
        |    END) AS shingles
        |  FROM toks
        |), e AS (
        |  SELECT doc_id, doc_id % 97 = 0 AS is_eval, unnest(shingles) AS s FROM sh
        |), ev AS (
        |  SELECT DISTINCT s FROM e WHERE is_eval
        |), train AS (
        |  SELECT doc_id, s FROM e WHERE NOT is_eval
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY 1
        |), hits AS (
        |  SELECT t.doc_id, count(*) AS n_hit FROM train t JOIN ev ON t.s = ev.s GROUP BY 1
        |)
        |SELECT s.doc_id, s.n_shingles, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
        |  round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / s.n_shingles, 6) AS containment,
        |  round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / s.n_shingles, 6) >= 0.5 AS contaminated
        |FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id ORDER BY s.doc_id""".stripMargin,

    // pipe06: the PiiPatterns regexes verbatim (RE2 subset — identical
    // span semantics in Java regex and DuckDB's RE2; q17/ta01
    // precedent). Replacement order email → ipv4 → ssn matches the
    // Spark fold; 'g' flag = Spark regexp_replace's replace-all default.
    "pipe06_pii" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
        |  CAST(len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS INT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_ssn,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IPV4>', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g')) AS redacted_md5,
        |  (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) > 0
        |   OR len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) > 0
        |   OR len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) > 0) AS has_pii
        |FROM documents ORDER BY doc_id""".stripMargin,

    // pipe07: md5-keyed deterministic shuffle — shard = leading hex
    // nibble, pos = dense rank within shard by (key, id).
    "pipe07_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id, md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |  FROM documents)
        |SELECT doc_id, shuffle_key,
        |  CAST(strpos('0123456789abcdef', substr(shuffle_key, 1, 1)) - 1 AS INT) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY strpos('0123456789abcdef', substr(shuffle_key, 1, 1))
        |    ORDER BY shuffle_key, doc_id) AS INT) AS pos
        |FROM k ORDER BY doc_id""".stripMargin,

    // pipe08: ta01's whitespace tokenizer; sums cast to BIGINT to match
    // Spark's sum(int)→long (DuckDB sum(INTEGER) is HUGEINT otherwise).
    // dd13: the committed span index — by the partial-count merge
    // argument (integer sums are associative) the incremental result
    // must equal the inline dd12 over the whole corpus restricted to
    // the batch, so the oracle IS dd12's SQL plus the batch filter.
    "dd13_span_committed" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(text)), '\\W+'), t -> t <> '') AS tk
         |  FROM documents
         |), wins AS (
         |  SELECT doc_id,
         |    unnest(range(len(tk) - 7)) AS wpos,
         |    unnest(list_transform(range(len(tk) - 7),
         |      i -> ${md5h1("array_to_string(tk[i+1:i+8], ' ')")})) AS wh
         |  FROM toks WHERE len(tk) >= 8
         |), dup AS (
         |  SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2
         |), cov AS (
         |  SELECT DISTINCT w.doc_id, w.wpos + offs.o AS cpos
         |  FROM wins w JOIN dup USING (wh)
         |  CROSS JOIN (SELECT unnest(range(8)) AS o) offs
         |), covagg AS (
         |  SELECT doc_id, count(*) AS n_removed, list(cpos) AS cps
         |  FROM cov GROUP BY doc_id
         |)
         |SELECT t.doc_id, CAST(len(tk) AS INT) AS n_tokens,
         |  CAST(coalesce(c.n_removed, 0) AS INT) AS n_removed,
         |  coalesce(array_to_string(list_filter(tk,
         |    (x, i) -> NOT coalesce(list_contains(c.cps, i - 1), false)), ' '), '') AS kept_text
         |FROM toks t LEFT JOIN covagg c USING (doc_id)
         |WHERE t.doc_id % 4 = 0
         |ORDER BY doc_id""".stripMargin,

    // pipe11: span decontamination — dd12's window/coverage/rebuild CTEs
    // with the flag set = the eval split's distinct window hashes
    // (pipe04's doc_id % 97 eval convention) instead of global count ≥ 2.
    "pipe11_span_decontaminate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, doc_id % 97 = 0 AS is_eval,
         |    list_filter(string_split_regex(lower(trim(text)), '\\W+'), t -> t <> '') AS tk
         |  FROM documents
         |), wins AS (
         |  SELECT doc_id, is_eval,
         |    unnest(range(len(tk) - 3)) AS wpos,
         |    unnest(list_transform(range(len(tk) - 3),
         |      i -> ${md5h1("array_to_string(tk[i+1:i+4], ' ')")})) AS wh
         |  FROM toks WHERE len(tk) >= 4
         |), evalw AS (
         |  SELECT DISTINCT wh FROM wins WHERE is_eval
         |), cov AS (
         |  SELECT DISTINCT w.doc_id, w.wpos + offs.o AS cpos
         |  FROM wins w JOIN evalw USING (wh)
         |  CROSS JOIN (SELECT unnest(range(4)) AS o) offs
         |  WHERE NOT w.is_eval
         |), covagg AS (
         |  SELECT doc_id, count(*) AS n_removed, list(cpos) AS cps
         |  FROM cov GROUP BY doc_id
         |)
         |SELECT t.doc_id, CAST(len(tk) AS INT) AS n_tokens,
         |  CAST(coalesce(c.n_removed, 0) AS INT) AS n_removed,
         |  coalesce(array_to_string(list_filter(tk,
         |    (x, i) -> NOT coalesce(list_contains(c.cps, i - 1), false)), ' '), '') AS kept_text
         |FROM toks t LEFT JOIN covagg c USING (doc_id)
         |WHERE NOT t.is_eval
         |ORDER BY doc_id""".stripMargin,

    // pipe10: cross-source overlap — dd05's tokenizer/shingle CTEs with
    // source as the set key; inner join, so only overlapping pairs list
    // (matches the Spark side's inner shape).
    "pipe10_source_overlap" ->
      """WITH toks AS (
        |  SELECT source,
        |    list_filter(string_split_regex(lower(trim(text)), '\W+'), t -> t <> '') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT source,
        |    list_distinct(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_transform(range(len(tk) - 2), i -> array_to_string(tk[i+1:i+3], ' '))
        |    END) AS shingles
        |  FROM toks
        |), e AS (
        |  SELECT DISTINCT source, unnest(shingles) AS s FROM sh
        |), sizes AS (
        |  SELECT source, count(*) AS sz FROM e GROUP BY 1
        |), inter AS (
        |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS i
        |  FROM e a JOIN e b ON a.s = b.s AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT p.source_a, p.source_b, p.i, sa.sz AS sz_a, sb.sz AS sz_b,
        |  round(CAST(p.i AS DOUBLE) / (sa.sz + sb.sz - p.i), 6) AS jaccard,
        |  round(CAST(p.i AS DOUBLE) / sa.sz, 6) AS containment_a,
        |  round(CAST(p.i AS DOUBLE) / sb.sz, 6) AS containment_b
        |FROM inter p
        |JOIN sizes sa ON sa.source = p.source_a
        |JOIN sizes sb ON sb.source = p.source_b
        |ORDER BY source_a, source_b""".stripMargin,

    "pipe08_mixture" ->
      """WITH per AS (
        |  SELECT lang, source,
        |    len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS n_tokens,
        |    length(text) AS n_chars
        |  FROM documents),
        |agg AS (
        |  SELECT lang, source, count(*) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS token_mass,
        |    CAST(sum(n_chars) AS BIGINT) AS char_mass
        |  FROM per GROUP BY 1, 2)
        |SELECT lang, source, n_docs, token_mass, char_mass,
        |  round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS doc_frac,
        |  round(CAST(token_mass AS DOUBLE) / sum(token_mass) OVER (), 6) AS token_frac
        |FROM agg ORDER BY lang, source""".stripMargin,

    // ta05: same tokenizer CTE as dd05 (oracle-green); per-n stats are
    // two grouped levels; LEFT JOIN + coalesce(…,0.0) mirrors the Spark
    // side's short-doc empty-gram branches. Double division + round(…,6)
    // follows the dd05/dd07 bit-parity precedent.
    "ta05_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\W+'), t -> t <> '') AS tk
        |  FROM documents),
        |c1 AS (SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest(tk) AS g FROM toks) GROUP BY 1, 2),
        |a1 AS (SELECT doc_id, sum(c) AS tot,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup FROM c1 GROUP BY 1),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(range(greatest(len(tk) - 1, 0)),
        |      i -> array_to_string(tk[i+1:i+2], ' '))) AS g FROM toks) GROUP BY 1, 2),
        |a2 AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM c2 GROUP BY 1),
        |c3 AS (SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(range(greatest(len(tk) - 2, 0)),
        |      i -> array_to_string(tk[i+1:i+3], ' '))) AS g FROM toks) GROUP BY 1, 2),
        |a3 AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM c3 GROUP BY 1),
        |c5 AS (SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(range(greatest(len(tk) - 4, 0)),
        |      i -> array_to_string(tk[i+1:i+5], ' '))) AS g FROM toks) GROUP BY 1, 2),
        |a5 AS (SELECT doc_id, sum(c) AS tot,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup FROM c5 GROUP BY 1)
        |SELECT d.doc_id,
        |  round(coalesce(CAST(a2.mx AS DOUBLE) / a2.tot, 0.0), 6) AS top2_frac,
        |  round(coalesce(CAST(a3.mx AS DOUBLE) / a3.tot, 0.0), 6) AS top3_frac,
        |  round(coalesce(CAST(a1.dup AS DOUBLE) / a1.tot, 0.0), 6) AS dup1_frac,
        |  round(coalesce(CAST(a5.dup AS DOUBLE) / a5.tot, 0.0), 6) AS dup5_frac
        |FROM documents d
        |LEFT JOIN a1 ON a1.doc_id = d.doc_id
        |LEFT JOIN a2 ON a2.doc_id = d.doc_id
        |LEFT JOIN a3 ON a3.doc_id = d.doc_id
        |LEFT JOIN a5 ON a5.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "ta06_vocab" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '\W+'), t -> t <> '')) AS token
        |  FROM documents)
        |SELECT token, count(*) AS cf, count(DISTINCT doc_id) AS df
        |FROM tok GROUP BY 1
        |ORDER BY cf DESC, token ASC LIMIT 30""".stripMargin,

    // ta09: the n-gram count table — one tagged unnest per (doc, n),
    // the same two aggregate levels as the Spark side.
    "ta09_ngram_counts" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\W+'), t -> t <> '') AS tk
        |  FROM documents
        |), tagged AS (
        |  SELECT doc_id, n,
        |    unnest(CASE WHEN len(tk) < n THEN []
        |      ELSE list_transform(range(len(tk) - n + 1), i -> array_to_string(tk[i+1:i+n], ' '))
        |    END) AS gram
        |  FROM toks CROSS JOIN (SELECT unnest([1, 2, 3]) AS n) ns
        |), perdoc AS (
        |  SELECT doc_id, n, gram, count(*) AS c FROM tagged GROUP BY 1, 2, 3
        |)
        |SELECT n, gram, CAST(sum(c) AS BIGINT) AS cf, count(*) AS df
        |FROM perdoc GROUP BY 1, 2
        |HAVING sum(c) >= 3
        |ORDER BY n, gram""".stripMargin,

    // ta08: per-doc top-5 TF-IDF, LINEAR idf n_docs/df — one IEEE
    // division + one multiply, bit-identical cross-engine; ranking uses
    // the UNROUNDED score (ties by token asc), display rounds to 6.
    "ta08_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '\W+'), t -> t <> '')) AS token
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
        |), dft AS (
        |  SELECT token, count(*) AS df FROM tf GROUP BY 1
        |), n AS (SELECT count(*) AS n FROM documents
        |), scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, dft.df,
        |    CAST(tf.tf AS DOUBLE) * (CAST(n.n AS DOUBLE) / dft.df) AS score_raw
        |  FROM tf JOIN dft USING (token) CROSS JOIN n
        |), r AS (
        |  SELECT doc_id, token, tf, df, score_raw,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY score_raw DESC, token ASC) AS rnk
        |  FROM scored
        |)
        |SELECT doc_id, CAST(rnk AS INT) AS rnk, token, tf, df,
        |  round(score_raw, 6) AS score
        |FROM r WHERE rnk <= 5
        |ORDER BY doc_id, rnk""".stripMargin,

    // ta07: the readability proxies verbatim; greatest(,1) guards match
    // the Spark side, double arithmetic is IEEE-identical, round(…,4).
    "ta07_readability" ->
      """SELECT doc_id,
        |  CAST(greatest(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')), 1) AS INT) AS n_words,
        |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS INT) AS n_sentences,
        |  CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS INT) AS n_syllables,
        |  round(206.835
        |    - 1.015 * (CAST(greatest(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')), 1) AS DOUBLE)
        |        / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
        |    - 84.6 * (CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS DOUBLE)
        |        / greatest(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')), 1)), 4) AS flesch
        |FROM documents ORDER BY doc_id""".stripMargin,

    "ta01_token_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars_measured,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS INT) AS n_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS INT) AS n_pieces
        |FROM documents ORDER BY doc_id""".stripMargin,

    // langid votes are pure length/replace arithmetic: (len - len(strip
    // marker))/len(marker). Integer '/' is float division in BOTH
    // engines; replace() counts non-overlapping occurrences in both.
    // lang_pred = first language (alphabetical) with votes > 0 equal to
    // the max — the CASE mirrors the Spark fold's acc="und" guard.
    "ta03_langid" -> {
      val markers = Map(
        "de" -> Seq(" der ", " die ", " und ", " ist ", " das ", " ein "),
        "en" -> Seq(" the ", " and ", " of ", " is ", " to ", " in "),
        "es" -> Seq(" el ", " la ", " y ", " es ", " los ", " una "),
        "fr" -> Seq(" le ", " la ", " et ", " est ", " les ", " une "))
      val langs = markers.keys.toSeq.sorted
      def votes(l: String) = markers(l)
        .map(m => s"(length(p) - length(replace(p, '$m', ''))) / ${m.length}")
        .mkString(" + ")
      val voteCols = langs.map(l => s"${votes(l)} AS v_$l").mkString(",\n  ")
      val gmax = s"greatest(${langs.map("v_" + _).mkString(", ")})"
      val cases = langs.map(l => s"WHEN v_$l > 0 AND v_$l = $gmax THEN '$l'")
        .mkString(" ")
      s"""WITH p0 AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
         |v AS (SELECT doc_id,
         |  $voteCols
         |FROM p0)
         |SELECT doc_id, v_de, v_en, v_es, v_fr,
         |  CASE $cases ELSE 'und' END AS lang_pred
         |FROM v ORDER BY doc_id""".stripMargin
    },

    "ta02_quality" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    length(text) AS nchar,
        |    len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS ntok,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> lower(t) IN ('the','a','of','and','to','in','is','that','for','on',
        |                        'with','as','at','by','an','be','this'))) AS stophits,
        |    length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS punct
        |  FROM documents
        |), scored AS (
        |  SELECT doc_id, ntok,
        |    CASE WHEN ntok > 0 THEN CAST(nchar - (ntok - 1) AS DOUBLE) / ntok ELSE 0.0 END AS mwl,
        |    least(CAST(nchar AS DOUBLE) / 200.0, 1.0) AS len_score,
        |    least(CAST(stophits AS DOUBLE) * 10.0 / greatest(ntok, 1), 1.0) AS stop_score,
        |    1.0 - least(CAST(punct AS DOUBLE) * 20.0 / greatest(nchar, 1), 1.0) AS punct_score
        |  FROM base)
        |SELECT doc_id, CAST(ntok AS INT) AS n_tokens,
        |  round(mwl, 4) AS mean_word_len,
        |  round(len_score * 0.3 + stop_score * 0.2 + punct_score * 0.3 +
        |    (CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2, 4) AS quality
        |FROM scored ORDER BY doc_id""".stripMargin,

    "mm01_media_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY media_id""".stripMargin)
}
