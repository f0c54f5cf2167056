package graft.core

import graft.text.TextAnalysis

/** DuckDB oracle fragments for the text/dedup/embedding kernels. Kept in
  * lockstep with [[graft.functions.TextFunctions]], [[graft.text.TextAnalysis]],
  * [[graft.dedup.MinHashLsh]], [[graft.dedup.SimHash]], and
  * [[graft.embed.HashingEmbedder]]. */
object OracleText {

  val P = 1000000007L

  def toks(c: String): String =
    s"list_filter(string_split_regex(lower($c), '\\s+'), x -> len(x) > 0)"

  /** polyHash of a string expression. */
  def polyHash(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT))), (acc, x) -> (acc * 31 + x) % $P)"

  /** Synthesized line-structured C4 pages + the line/keep decomposition —
    * the WITH-clause prefix shared by the tc_c4_* oracles. Kept in lockstep
    * with Queries.c4Pages and [[graft.text.Curation.c4Filters]]. Emits CTEs
    * c4pages(id, text) and c4kept(id, lines, kept, text). */
  def c4Ctes(minWords: Int = 3): String = {
    val t = toks("text")
    s"""c4b AS MATERIALIZED (
       |  SELECT doc_id AS id, $t AS t, CAST(floor(len($t)/5) AS INT) AS nl
       |  FROM documents WHERE len($t) >= 5),
       |c4lines AS (
       |  SELECT id, list_transform(range(0, nl), i ->
       |    array_to_string(list_slice(t, i*5 + 1,
       |      i*5 + (CASE WHEN (id + i) % 5 = 0 THEN 2 ELSE 5 END)), ' ') ||
       |    (CASE WHEN (id + i) % 7 = 0 THEN ' privacy policy' ELSE '' END) ||
       |    (CASE WHEN (id + i) % 3 = 0 THEN ''
       |         WHEN (id + i) % 3 = 1 THEN '.' ELSE '?' END)) AS ls
       |  FROM c4b),
       |c4pages AS MATERIALIZED (
       |  SELECT id, array_to_string(ls, chr(10)) ||
       |    (CASE WHEN id % 37 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END) ||
       |    (CASE WHEN id % 41 = 0 THEN chr(10) || 'var cfg = { mode: 1 };' ELSE '' END) AS text
       |  FROM c4lines),
       |c4split AS (
       |  SELECT id, list_filter(list_transform(string_split(text, chr(10)),
       |    l -> trim(l)), l -> len(l) > 0) AS lines, text
       |  FROM c4pages),
       |c4kept AS MATERIALIZED (
       |  SELECT id, lines, list_filter(lines, l ->
       |      regexp_matches(l, '[.!?"]${"$"}')
       |      AND len(list_filter(string_split_regex(l, '\\s+'),
       |            w -> len(w) > 0)) >= $minWords
       |      AND NOT regexp_matches(lower(l),
       |            '(javascript|privacy policy|terms of use|cookie policy|uses cookies)')
       |    ) AS kept, text
       |  FROM c4split)""".stripMargin
  }

  /** Distinct 3-gram shingle-hash CTE over documents: sh(id, sh).
    * `where` optionally restricts the corpus (the incremental-maintenance
    * oracles recompute over a post-CDC survivor set). */
  /** `from` must expose (doc_id, text) — defaults to the raw documents
    * table; CDC-shaped oracles pass a `live` CTE with post-change text. */
  def shingleCte(n: Int = 3, where: String = "", from: String = "documents"): String = {
    val t = toks("text")
    val extra = if (where.isEmpty) "" else s" AND ($where)"
    s"""sh AS MATERIALIZED (
       |  SELECT doc_id AS id, list_distinct(list_transform(range(1, len($t) - ${n - 2}),
       |    i -> ${polyHash(s"array_to_string(list_slice($t, i, i + ${n - 1}), ' ')")})) AS sh
       |  FROM $from WHERE len($t) >= $n$extra
       |)""".stripMargin
  }

  /** MinHash signature + LSH band CTEs: sig(id, sig), band(id, b, key). */
  val minhashCtes: String =
    s"""sig AS MATERIALIZED (
       |  SELECT id, list_transform(range(0, 32),
       |    i -> list_min(list_transform(sh, x -> (x * (2*i + 1) + 7919*i + 13) % $P))) AS sig
       |  FROM sh
       |),
       |band AS MATERIALIZED (
       |  SELECT id, t.b, array_to_string(list_slice(sig, t.b*4 + 1, t.b*4 + 4), ',') AS key
       |  FROM sig, range(0, 8) t(b)
       |)""".stripMargin

  /** SimHash fingerprint CTE: sfp(id, simhash). */
  val simhashCtes: String =
    s"""stf AS MATERIALIZED (
       |  SELECT d.doc_id AS id, t.term, count(*) AS tf
       |  FROM documents d, unnest(${toks("d.text")}) AS t(term) GROUP BY 1, 2
       |),
       |sbit AS (
       |  SELECT id, b.bit,
       |    sum(CASE WHEN (${polyHash("term")} >> b.bit) % 2 = 1 THEN tf ELSE -tf END) AS v
       |  FROM stf, range(0, 30) b(bit) GROUP BY 1, 2
       |),
       |sfp AS MATERIALIZED (
       |  SELECT id, CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
       |  FROM sbit GROUP BY 1
       |)""".stripMargin

  private def stopList(lang: String): String =
    TextAnalysis.Profiles.toMap.apply(lang).map(s => s"'$s'").mkString("[", ", ", "]")

  /** The heuristic quality score over a text column `txt` with its token
    * list `t` in scope — mirrors [[graft.text.TextAnalysis.qualityScore]]
    * (length saturation, en-stopword ratio, unique ratio, digit ratio),
    * 6dp-rounded. Shared by the profile SELECT and the signal-agreement
    * audit so the two can never drift. */
  def qualityExpr(txt: String, t: String): String =
    s"""round(least(len($t) / 100.0, 1.0) * 0.3
       |    + (CAST(len(list_filter($t, x -> list_contains(${stopList("en")}, x))) AS DOUBLE) / len($t)) * 0.2
       |    + (CAST(len(list_distinct($t)) AS DOUBLE) / len($t)) * 0.3
       |    + (1.0 - CAST(len(regexp_replace($txt, '[^0-9]', '', 'g')) AS DOUBLE) / greatest(len($txt), 1)) * 0.2, 6)""".stripMargin

  /** Per-doc language/quality/token-count profile SELECT over documents. */
  val textProfileSql: String = {
    val t = toks("text")
    def ratio(lang: String) =
      s"round(CAST(len(list_filter(t, x -> list_contains(${stopList(lang)}, x))) AS DOUBLE) / len(t), 6)"
    s"""WITH tk AS MATERIALIZED (SELECT doc_id AS id, text, $t AS t FROM documents),
       |sc AS (
       |  SELECT id, text, t, ${ratio("en")} AS s_en, ${ratio("de")} AS s_de,
       |    ${ratio("fr")} AS s_fr, ${ratio("es")} AS s_es
       |  FROM tk WHERE len(t) > 0
       |)
       |SELECT id,
       |  CASE WHEN greatest(s_en, s_de, s_fr, s_es) > 0 THEN
       |    CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
       |         WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
       |         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
       |         ELSE 'es' END
       |    ELSE 'und' END AS lang,
       |  greatest(s_en, s_de, s_fr, s_es) AS lang_score,
       |  ${qualityExpr("text", "t")} AS quality,
       |  len(t) AS n_ws,
       |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe
       |FROM sc ORDER BY id""".stripMargin
  }

  /** Curation-pipeline CTE chain mirroring [[graft.text.Curation.curate]]:
    * cprof(id, text, t, lang, quality, n_ws, n_bpe) → ckeep → cex (exact
    * dedup on normalized text) → cpairs(id_a, id_b, jaccard ≥ threshold) →
    * csurv (cex minus the higher id of each near-dup pair). */
  def curationCtes(minQuality: Double = 0.5, minTokens: Int = 10,
                   jaccard: Double = 0.2): String = {
    val t = toks("text")
    def ratio(lang: String) =
      s"round(CAST(len(list_filter(t, x -> list_contains(${stopList(lang)}, x))) AS DOUBLE) / len(t), 6)"
    s"""ctk AS MATERIALIZED (SELECT doc_id AS id, text, $t AS t FROM documents WHERE len($t) > 0),
       |csc AS (
       |  SELECT id, text, t, ${ratio("en")} AS s_en, ${ratio("de")} AS s_de,
       |    ${ratio("fr")} AS s_fr, ${ratio("es")} AS s_es
       |  FROM ctk),
       |cprof AS MATERIALIZED (
       |  SELECT id, text, t,
       |    CASE WHEN greatest(s_en, s_de, s_fr, s_es) > 0 THEN
       |      CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
       |           WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
       |           WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
       |           ELSE 'es' END
       |      ELSE 'und' END AS lang,
       |    round(least(len(t) / 100.0, 1.0) * 0.3
       |      + (CAST(len(list_filter(t, x -> list_contains(${stopList("en")}, x))) AS DOUBLE) / len(t)) * 0.2
       |      + (CAST(len(list_distinct(t)) AS DOUBLE) / len(t)) * 0.3
       |      + (1.0 - CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / greatest(len(text), 1)) * 0.2, 6) AS quality,
       |    len(t) AS n_ws,
       |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe
       |  FROM csc),
       |ckeep AS MATERIALIZED (
       |  SELECT * FROM cprof
       |  WHERE lang = 'en' AND quality >= CAST('$minQuality' AS DOUBLE) AND n_ws >= $minTokens),
       |cex AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY array_to_string(t, ' ') ORDER BY id) AS rn
       |    FROM ckeep) WHERE rn = 1),
       |csh AS MATERIALIZED (
       |  SELECT id, list_distinct(list_transform(range(1, len(t) - 1),
       |    i -> ${polyHash("array_to_string(list_slice(t, i, i + 2), ' ')")})) AS sh
       |  FROM cex WHERE len(t) >= 3),
       |csig AS MATERIALIZED (
       |  SELECT id, list_transform(range(0, 32),
       |    i -> list_min(list_transform(sh, x -> (x * (2*i + 1) + 7919*i + 13) % $P))) AS sig
       |  FROM csh),
       |cband AS MATERIALIZED (
       |  SELECT id, t.b, array_to_string(list_slice(sig, t.b*4 + 1, t.b*4 + 4), ',') AS key
       |  FROM csig, range(0, 8) t(b)),
       |ccp AS MATERIALIZED (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM cband a JOIN cband b ON a.b = b.b AND a.key = b.key AND a.id < b.id),
       |cpairs AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT ccp.id_a, ccp.id_b,
       |      round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
       |        / len(list_distinct(x.sh || y.sh)), 6) AS jaccard
       |    FROM ccp JOIN csh x ON ccp.id_a = x.id JOIN csh y ON ccp.id_b = y.id)
       |  WHERE jaccard >= CAST('$jaccard' AS DOUBLE)),
       |csurv AS MATERIALIZED (
       |  SELECT * FROM cex WHERE id NOT IN (SELECT id_b FROM cpairs))""".stripMargin
  }

  /** Subword gram text of a (lowercased, whitespace-free) token expression
    * `t` — the token plus its character trigrams, space-joined; tokens
    * shorter than 3 chars pass through alone. Kept in lockstep with
    * [[graft.search.LateInteraction.gramText]]. */
  def gramSql(t: String): String =
    s"CASE WHEN len($t) >= 3 THEN $t || ' ' || array_to_string(list_transform(range(1, len($t) - 1), i -> substr($t, CAST(i AS INT), 3)), ' ') ELSE $t END"

  /** Hashing-embedder CTE chain: ef(id, e) with FLOAT-rounded components. */
  def embedCtes(dim: Int = 64): String =
    embedCtesOver("(SELECT doc_id AS id, text FROM documents) dsrc", dim)

  /** Same chain over any (id, text) relation `src` (a parenthesized
    * aliased subquery or CTE name). `prefix` renames the emitted CTEs
    * (${prefix}r/${prefix}n/${prefix}f) so two chains can coexist in one
    * query (e.g. corpus + query embeddings in the retrieval eval). */
  def embedCtesOver(src: String, dim: Int = 64, prefix: String = "e"): String = {
    val t = toks("text")
    val hashes = s"list_transform($t, tt -> ${polyHash("tt")})"
    s"""${prefix}r AS MATERIALIZED (
       |  SELECT id,
       |    list_transform(range(0, $dim), i -> CAST(list_sum(list_transform($hashes,
       |      h -> CASE WHEN h % $dim = i THEN CASE WHEN (h // $dim) % 2 = 0 THEN 1.0 ELSE -1.0 END ELSE 0.0 END)) AS DOUBLE)) AS r
       |  FROM $src
       |),
       |${prefix}n AS (SELECT id, r, sqrt(list_sum(list_transform(r, x -> x * x))) AS nrm FROM ${prefix}r),
       |${prefix}f AS MATERIALIZED (
       |  SELECT id, CASE WHEN nrm > 0
       |    THEN list_transform(r, x -> CAST(CAST(x / nrm AS FLOAT) AS DOUBLE))
       |    ELSE list_transform(r, x -> 0.0) END AS e
       |  FROM ${prefix}n
       |)""".stripMargin
  }

  /** BPE merge-training CTE chain (kept in lockstep with
    * [[graft.text.Bpe]]): wc (word counts) → w0 (SEP-wrapped symbol
    * encoding, SEP = chr(1)) → per round i: p_i (pair counts), b_i (argmax
    * pair, ties lexicographic), w_{i+1} (greedy left-to-right fuse via
    * literal replace). The original word rides every w_i so appliers can
    * join tokenized symbol counts back to term occurrences. */
  def bpeCtes(k: Int): String = {
    val t = toks("text")
    val ctes = scala.collection.mutable.ArrayBuffer(
      s"""wc AS (
         |  SELECT t.term AS w, count(*) AS freq
         |  FROM documents, unnest($t) AS t(term) GROUP BY 1)""".stripMargin,
      """w0 AS MATERIALIZED (
        |  SELECT w, chr(1) || array_to_string(string_split(replace(w, chr(1), ''), ''),
        |    chr(1)||chr(1)) || chr(1) AS s, freq
        |  FROM wc)""".stripMargin)
    for (i <- 0 until k) {
      ctes += s"""p$i AS MATERIALIZED (
         |  SELECT p.a AS a, p.b AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, list_filter(string_split(trim(s, chr(1)),
         |          chr(1)||chr(1)), x -> len(x) > 0) AS sy FROM w$i) q,
         |    unnest(list_transform(range(1, len(q.sy)),
         |      i -> {'a': q.sy[i], 'b': q.sy[i+1]})) AS u(p)
         |  GROUP BY 1, 2)""".stripMargin
      ctes += s"b$i AS MATERIALIZED (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1)"
      // LEFT JOIN ON TRUE, not a cross join: when the corpus runs out of
      // merges before round k, b$i is EMPTY — a cross join would empty the
      // whole w-chain (and every later round), while the left join keeps s
      // unchanged (null pattern -> null replace -> coalesce), mirroring
      // trainMerges' early stop.
      ctes += s"""w${i + 1} AS MATERIALIZED (
         |  SELECT w.w, coalesce(replace(w.s, chr(1)||b.a||chr(1)||chr(1)||b.b||chr(1),
         |      chr(1)||b.a||b.b||chr(1)), w.s) AS s, w.freq
         |  FROM w$i w LEFT JOIN b$i b ON TRUE)""".stripMargin
    }
    ctes.mkString(",\n")
  }

  /** One unrolled Viterbi DP over `wordsCte(w, len, freq)` with piece
    * costs `vocabCte(piece, cost)`: forward CTEs ${prefix}d1..d{maxLen}
    * (min integer path cost + backpointer length per position, ties by
    * (cost, l) — [[graft.text.Unigram.segmentCol]]'s array_min order),
    * backtrack CTEs ${prefix}b1..b{maxLen}, the piece stream ${prefix}p
    * (w, piece), and weighted counts ${prefix}c(piece, cnt). */
  def unigramDpCtes(prefix: String, vocabCte: String,
                    wordsCte: String = "ugw"): String = {
    val maxLen = graft.text.Unigram.MaxWordLen
    val maxPiece = graft.text.Unigram.MaxPieceLen
    val ctes = scala.collection.mutable.ArrayBuffer(
      s"${prefix}d0 AS (SELECT w, len, CAST(0 AS BIGINT) AS c, 0 AS l FROM $wordsCte)")
    for (i <- 1 to maxLen) {
      val arms = (1 to math.min(maxPiece, i)).map { l =>
        s"""SELECT p.w, p.len, p.c + v.cost AS c, $l AS l
           |      FROM ${prefix}d${i - l} p JOIN $vocabCte v
           |        ON v.piece = substr(p.w, ${i - l + 1}, $l)
           |      WHERE p.len >= $i""".stripMargin
      }.mkString("\n      UNION ALL\n      ")
      ctes += s"""${prefix}d$i AS MATERIALIZED (
         |  SELECT w, len, c, l FROM (
         |    SELECT q.*, row_number() OVER (PARTITION BY q.w ORDER BY q.c, q.l) AS rn
         |    FROM (
         |      $arms
         |    ) q) WHERE rn = 1)""".stripMargin
    }
    ctes += (1 to maxLen)
      .map(i => s"SELECT w, $i AS i, l FROM ${prefix}d$i")
      .mkString(s"${prefix}a AS MATERIALIZED (", " UNION ALL ", ")")
    ctes += s"${prefix}b0 AS (SELECT w, len AS pos FROM $wordsCte)"
    for (s <- 1 to maxLen) {
      ctes += s"""${prefix}b$s AS MATERIALIZED (
         |  SELECT b.w,
         |    CASE WHEN b.pos > 0 THEN b.pos - d.l ELSE 0 END AS pos,
         |    CASE WHEN b.pos > 0 THEN substr(b.w, b.pos - d.l + 1, d.l) END AS piece
         |  FROM ${prefix}b${s - 1} b
         |  LEFT JOIN ${prefix}a d ON d.w = b.w AND d.i = b.pos)""".stripMargin
    }
    ctes += (1 to maxLen)
      .map(s => s"SELECT w, piece FROM ${prefix}b$s")
      .mkString(s"${prefix}p AS MATERIALIZED (SELECT w, piece FROM (",
        " UNION ALL ", ") WHERE piece IS NOT NULL)")
    ctes += s"""${prefix}c AS MATERIALIZED (
       |  SELECT p.piece, CAST(sum(u.freq) AS BIGINT) AS cnt
       |  FROM ${prefix}p p JOIN $wordsCte u USING (w) GROUP BY 1)""".stripMargin
    ctes.mkString(",\n")
  }

  /** counts → integer micro-nat costs CTE: `$name(piece, cost)` =
    * round(ln(total/cnt)·1e6) over `$countsCte(piece, cnt)`. */
  private def unigramVocabCte(name: String, countsCte: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT piece,
       |    CAST(round(ln(CAST(t.total AS DOUBLE) / cnt) * 1e6, 0) AS BIGINT) AS cost
       |  FROM $countsCte, (SELECT sum(cnt) AS total FROM $countsCte) t)""".stripMargin

  /** The full unigram-LM training chain (kept in lockstep with
    * [[graft.text.Unigram]]): ugw (trainable word counts) → ugseed (seed
    * counts: chars + capped multi-char substrings) → ugv0 (seed costs) →
    * per EM round r: DP ug{r}* + counts ug{r}c + costs ugv{r} → final
    * pruned vocabulary ugfin(piece, cnt) (top-TopMulti multi + floored
    * chars) and its costs ugvf. */
  def unigramCtes(): String = {
    val u = graft.text.Unigram
    val t = toks("text")
    val ctes = scala.collection.mutable.ArrayBuffer(
      s"""ugw AS MATERIALIZED (
         |  SELECT t.term AS w, CAST(len(t.term) AS INT) AS len,
         |    CAST(count(*) AS BIGINT) AS freq
         |  FROM documents, unnest($t) AS t(term)
         |  WHERE len(t.term) BETWEEN 1 AND ${u.MaxWordLen} GROUP BY 1, 2)""".stripMargin,
      s"""ugs0 AS MATERIALIZED (
         |  SELECT s.piece, CAST(sum(w.freq) AS BIGINT) AS cnt
         |  FROM ugw w, unnest(flatten(list_transform(range(1, w.len + 1), i ->
         |    list_transform(range(1, least(${u.MaxPieceLen}, w.len - i + 1) + 1), l ->
         |      substr(w.w, CAST(i AS INT), CAST(l AS INT)))))) AS s(piece)
         |  GROUP BY 1)""".stripMargin,
      s"""ugseed AS MATERIALIZED (
         |  SELECT piece, cnt FROM ugs0 WHERE len(piece) = 1
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt FROM ugs0
         |    WHERE len(piece) > 1 AND cnt >= ${u.MinSeedCount}
         |    ORDER BY cnt DESC, piece LIMIT ${u.MaxSeed}))""".stripMargin,
      unigramVocabCte("ugv0", "ugseed"))
    for (r <- 1 to u.EmRounds) {
      ctes += unigramDpCtes(s"ug$r", s"ugv${r - 1}")
      ctes += unigramVocabCte(s"ugv$r", s"ug${r}c")
    }
    val last = s"ug${u.EmRounds}c"
    ctes += s"""ugfin AS MATERIALIZED (
       |  SELECT s.piece, greatest(coalesce(c.cnt, 0), 1) AS cnt
       |  FROM (SELECT piece FROM ugseed WHERE len(piece) = 1) s
       |  LEFT JOIN $last c USING (piece)
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM $last WHERE len(piece) > 1
       |    ORDER BY cnt DESC, piece LIMIT ${u.TopMulti}))""".stripMargin
    ctes += unigramVocabCte("ugvf", "ugfin")
    ctes.mkString(",\n")
  }

  /** Top-5-neighbor cosine dup-pair CTE over memories: pr(id_a,id_b,similarity).
    * Mirrors [[graft.dedup.Dedup.findDuplicates]]. */
  def dupPairsCte(threshold: Double, searchK: Int = 5,
                  table: String = "memories"): String =
    s"""pr AS MATERIALIZED (
       |  SELECT DISTINCT least(ia, ib) AS id_a, greatest(ia, ib) AS id_b, round(sim, 4) AS similarity
       |  FROM (
       |    SELECT ia, ib, sim, row_number() OVER (PARTITION BY ia ORDER BY sim DESC, ib) AS rn
       |    FROM (
       |      SELECT a.id AS ia, b.id AS ib,
       |        round(${OracleCtes.dot64("a.embedding", "b.embedding")}, 6) AS sim
       |      FROM $table a JOIN $table b ON a.id <> b.id))
       |  WHERE rn <= $searchK AND sim >= $threshold
       |)""".stripMargin
}
