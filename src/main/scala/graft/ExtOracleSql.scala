package graft

/** DuckDB-dialect oracle SQL for the ExtQueries extension operators.
  *
  * Portability contract with the Spark implementations:
  *  - every float reduction is a left fold in array order (`list_reduce`
  *    here, `aggregate` in Spark) → bit-identical doubles, no epsilon;
  *  - "hash functions" are md5-hex strings compared lexicographically;
  *  - DuckDB list slicing `l[a:b]` is 1-based inclusive = Spark
  *    `slice(l, a, b-a+1)`; `range(a, b)` is end-exclusive = Spark
  *    `sequence(a, b-1)`.
  */
object ExtOracleSql {

  /** The near-dup corpus MINUS the state-purge roster (`doc_id % 89`
    * over base and planted ids alike) — the "purged corpus" every
    * round-8 full-recompute twin rebuilds from. Named `nd` so the
    * shared [[minhashBandedCtes]] chain applies unchanged.
    */
  private val nearDupCorpusPurged =
    """nd AS (
      |  SELECT * FROM (
      |    SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |    UNION ALL
      |    SELECT doc_id + 1000000 AS doc_id,
      |      (string_split(text, ' '))[6:len(string_split(text, ' '))] AS words
      |    FROM documents WHERE doc_id % 10 = 0)
      |  WHERE doc_id % 89 <> 0)""".stripMargin

  /** (doc_id, words) corpus + near-dup copies of every 10th doc. */
  private val nearDupCorpus =
    """nd AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    (string_split(text, ' '))[6:len(string_split(text, ' '))] AS words
      |  FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  /** The minhash signature + banding CTE chain over the `nd` corpus —
    * shared by every query that consumes LSH bands (one-shot detector,
    * fuzzy decontamination, verified exact Jaccard).
    */
  private val minhashBandedCtes: String =
    """sh AS (
      |  SELECT doc_id, list_distinct(
      |    [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS shingles
      |  FROM nd WHERE len(words) >= 3),
      |sig AS (
      |  SELECT doc_id,
      |    [list_min([substr(md5(CAST((i // 4) AS VARCHAR) || ':' || s), (i % 4) * 8 + 1, 8)
      |               for s in shingles])
      |     for i in range(0, 16)] AS sigs
      |  FROM sh),
      |banded AS (
      |  SELECT doc_id, sigs,
      |    unnest([md5(CAST(b AS VARCHAR) || '|' || array_to_string(sigs[b*4+1:b*4+4], '|'))
      |            for b in range(0, 4)]) AS band
      |  FROM sig)""".stripMargin

  val dedupMinhashLsh: String =
    s"""WITH $nearDupCorpus,
       |$minhashBandedCtes,
       |-- same bounded-bucket candidate generation as operators.Buckets:
       |-- degenerate band values (> 500 members) are dropped on BOTH engines
       |bc AS (SELECT band FROM banded GROUP BY band HAVING COUNT(*) BETWEEN 2 AND 500)
       |SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       |  CAST(len(list_filter(range(1, 17), i -> a.sigs[i] = b.sigs[i])) AS DOUBLE) / 16 AS est_jaccard
       |FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
       |JOIN bc ON a.band = bc.band
       |WHERE CAST(len(list_filter(range(1, 17), i -> a.sigs[i] = b.sigs[i])) AS DOUBLE) / 16 >= 0.4""".stripMargin

  /** text_decontaminate_fuzzy twin: the minhash signature/band CTEs over
    * the dup corpus, split into eval (every 50th base doc) vs train,
    * band join + signature-Jaccard ≥ 0.4, best eval match per doc (est
    * desc, ref asc — the struct-max argmax's order).
    */
  val textDecontaminateFuzzy: String =
    s"""WITH $nearDupCorpus,
       |$minhashBandedCtes,
       |ref AS (SELECT doc_id AS ref_id, sigs AS ref_sigs, band FROM banded
       |        WHERE doc_id % 50 = 0 AND doc_id < 1000000),
       |tr AS (SELECT * FROM banded
       |       WHERE NOT (doc_id % 50 = 0 AND doc_id < 1000000)),
       |cand AS (
       |  SELECT tr.doc_id, ref.ref_id,
       |    CAST(len(list_filter(range(1, 17), i -> tr.sigs[i] = ref.ref_sigs[i])) AS DOUBLE) / 16 AS est
       |  FROM tr JOIN ref USING (band)
       |  WHERE CAST(len(list_filter(range(1, 17), i -> tr.sigs[i] = ref.ref_sigs[i])) AS DOUBLE) / 16 >= 0.4),
       |best AS (
       |  SELECT doc_id, ref_id, est FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY est DESC NULLS LAST, ref_id ASC NULLS FIRST) AS rn
       |    FROM cand)
       |  WHERE rn = 1)
       |SELECT t.doc_id, (b.ref_id IS NOT NULL) AS contaminated,
       |  b.ref_id, round(b.est, 6) AS est_jaccard
       |FROM (SELECT doc_id FROM nd WHERE NOT (doc_id % 50 = 0 AND doc_id < 1000000)) t
       |LEFT JOIN best b USING (doc_id)""".stripMargin

  private val simhashBitSums: String = (0 until 64).map { j =>
    val i = j / 4 + 1; val b = j % 4
    s"SUM(CASE WHEN (((strpos('0123456789abcdef', substr(md5(w), $i, 1)) - 1) >> $b) & 1) = 1" +
      s" THEN 1 ELSE -1 END) AS b$j"
  }.mkString(",\n    ")

  private val simhashConcat: String =
    (0 until 64).map(j => s"(CASE WHEN b$j >= 0 THEN '1' ELSE '0' END)").mkString(" || ")

  val dedupSimhash: String =
    s"""WITH $nearDupCorpus,
       |tok AS (SELECT doc_id, unnest(words) AS w FROM nd),
       |bitsums AS (
       |  SELECT doc_id,
       |    $simhashBitSums
       |  FROM tok GROUP BY doc_id),
       |sim AS (SELECT doc_id, $simhashConcat AS simhash FROM bitsums),
       |blocks AS (
       |  SELECT doc_id, simhash,
       |    unnest([CAST(j AS VARCHAR) || '|' || substr(simhash, 1 + j*16, 16)
       |            for j in range(0, 4)]) AS block
       |  FROM sim),
       |-- same bounded-bucket candidate generation as operators.Buckets:
       |-- degenerate block values (> 500 members) are dropped on BOTH engines
       |bc AS (SELECT block FROM blocks GROUP BY block HAVING COUNT(*) BETWEEN 2 AND 500)
       |SELECT DISTINCT a.doc_id AS doc_id_1, b2.doc_id AS doc_id_2, a.simhash AS simhash_1,
       |  64 - len(list_filter(range(1, 65),
       |           i -> substr(a.simhash, i, 1) = substr(b2.simhash, i, 1))) AS hamming
       |FROM blocks a JOIN blocks b2 ON a.block = b2.block AND a.doc_id < b2.doc_id
       |JOIN bc ON a.block = bc.block
       |WHERE 64 - len(list_filter(range(1, 65),
       |        i -> substr(a.simhash, i, 1) = substr(b2.simhash, i, 1))) <= 3""".stripMargin

  /** dedup_image_phash twin: replays the textured-PNG GENERATOR's
    * contract (g(x,y) = 32 + ((a·x + b·y + c·x·y + d) mod 192) + shift
    * from the sha256 hex code points) and the aHash arithmetic (4×4
    * block sums, bit = bsum·64 > total — all integer-exact), then the
    * simhash detector's 4×16-bit block-LSH pairing. DuckDB never
    * decodes an image; Spark's hash comes from codec-read pixels — a
    * match certifies the encode→binary→decode round trip.
    */
  /** The textured-fixture aHash CTE chain (generator replay → block
    * sums → bit string → 4×16-bit blocks → total-membership bucket
    * cap) — shared by the one-shot and incremental image-phash twins.
    */
  private val phashCtes: String =
    """base AS (
      |  SELECT doc_id, text, 0 AS shift FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text, 8 AS shift
      |  FROM documents WHERE doc_id % 10 = 0),
      |hx AS (
      |  SELECT doc_id, shift,
      |    ascii(substr(sha256(text), 1, 1)) AS a, ascii(substr(sha256(text), 2, 1)) AS b,
      |    ascii(substr(sha256(text), 3, 1)) AS c, ascii(substr(sha256(text), 4, 1)) AS d,
      |    ascii(substr(sha256(text), 5, 1)) AS e, ascii(substr(sha256(text), 6, 1)) AS f
      |  FROM base),
      |px AS (
      |  SELECT doc_id, (y // 4) * 8 + (x // 4) AS j,
      |    32 + ((a * x + b * y + c * x * y + d + e * x * x + f * y * y) % 192) + shift AS g
      |  FROM hx CROSS JOIN range(0, 32) xs(x) CROSS JOIN range(0, 32) ys(y)),
      |blk AS (SELECT doc_id, j, SUM(g) AS bsum FROM px GROUP BY doc_id, j),
      |tot AS (SELECT doc_id, SUM(bsum) AS total FROM blk GROUP BY doc_id),
      |code AS (
      |  SELECT b.doc_id,
      |    string_agg(CASE WHEN b.bsum * 64 > t.total THEN '1' ELSE '0' END, ''
      |               ORDER BY b.j) AS phash
      |  FROM blk b JOIN tot t USING (doc_id) GROUP BY b.doc_id),
      |blocks AS (
      |  SELECT doc_id, phash,
      |    unnest([CAST(j AS VARCHAR) || '|' || substr(phash, 1 + j*16, 16)
      |            for j in range(0, 4)]) AS block
      |  FROM code)""".stripMargin

  /** Total-membership bucket cap (operators.Buckets) for the one-shot
    * and incremental twins; the streaming twin caps on the CORPUS side
    * (arrival-order independence) like its minhash sibling.
    */
  private val phashTotalCap =
    "bc AS (SELECT block FROM blocks GROUP BY block HAVING COUNT(*) BETWEEN 2 AND 500)"

  val dedupImagePhash: String =
    s"""WITH $phashCtes,
       |$phashTotalCap
       |SELECT DISTINCT a.doc_id AS doc_id_1, b2.doc_id AS doc_id_2, a.phash AS phash_1,
       |  64 - len(list_filter(range(1, 65),
       |           i -> substr(a.phash, i, 1) = substr(b2.phash, i, 1))) AS hamming
       |FROM blocks a JOIN blocks b2 ON a.block = b2.block AND a.doc_id < b2.doc_id
       |JOIN bc ON a.block = bc.block
       |WHERE 64 - len(list_filter(range(1, 65),
       |        i -> substr(a.phash, i, 1) = substr(b2.phash, i, 1))) <= 3""".stripMargin

  /** pipeline_dedup_image_incremental twin: the full one-shot detector
    * restricted to batch-touching pairs — the bucket cap stays on
    * TOTAL membership, exactly the contract `phashPairsAgainst`'s
    * stored-state filter reproduces (a saturated corpus band forces
    * total > cap on both sides).
    */
  val pipelineDedupImageIncremental: String =
    s"""WITH $phashCtes,
       |$phashTotalCap,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_id_1, b2.doc_id AS doc_id_2,
       |    CAST(64 - len(list_filter(range(1, 65),
       |             i -> substr(a.phash, i, 1) = substr(b2.phash, i, 1))) AS BIGINT) AS hamming
       |  FROM blocks a JOIN blocks b2 ON a.block = b2.block AND a.doc_id < b2.doc_id
       |  JOIN bc ON a.block = bc.block
       |  WHERE 64 - len(list_filter(range(1, 65),
       |          i -> substr(a.phash, i, 1) = substr(b2.phash, i, 1))) <= 3)
       |SELECT * FROM pairs WHERE doc_id_1 % 7 = 0 OR doc_id_2 % 7 = 0""".stripMargin

  /** dedup_audio_phash twin: replays the textured-WAV generator
    * (two digest-keyed components × amplitude) and the frame-energy
    * hash (first 512 samples, 64 frames of 8, bit = e_j·64 > total)
    * from sha256(text), then the same block-LSH pairing — DuckDB
    * never parses a WAV; Spark's hash comes from codec-read samples.
    */
  val dedupAudioPhash: String =
    """WITH base AS (
      |  SELECT doc_id, text, 64 AS amp FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text, 32 AS amp
      |  FROM documents WHERE doc_id % 10 = 0),
      |hx AS (
      |  SELECT doc_id, amp,
      |    3 + (ascii(substr(sha256(text), 3, 1)) % 61) AS f1,
      |    2 + (ascii(substr(sha256(text), 4, 1)) % 53) AS f2,
      |    ascii(substr(sha256(text), 5, 1)) + 17 * ascii(substr(sha256(text), 8, 1)) AS p,
      |    ascii(substr(sha256(text), 6, 1)) + 11 * ascii(substr(sha256(text), 9, 1)) AS q,
      |    1 + (ascii(substr(sha256(text), 7, 1)) % 47) AS f3
      |  FROM base),
      |sm AS (
      |  SELECT doc_id, j,
      |    abs(((((7*j * f1 + p) % 256) - 128) + (((7*j * f2 + q) % 128) - 64)
      |         + (((7*j * 7*j * f3) % 128) - 64)) * amp) AS a0,
      |    abs((((((7*j+3) * f1 + p) % 256) - 128) + ((((7*j+3) * f2 + q) % 128) - 64)
      |         + ((((7*j+3) * (7*j+3) * f3) % 128) - 64)) * amp) AS a1
      |  FROM hx CROSS JOIN range(0, 64) s(j)),
      |code AS (
      |  SELECT doc_id,
      |    string_agg(CASE WHEN a0 > a1 THEN '1' ELSE '0' END, '' ORDER BY j) AS phash
      |  FROM sm GROUP BY doc_id),
      |blocks AS (
      |  SELECT doc_id, phash,
      |    unnest([CAST(j AS VARCHAR) || '|' || substr(phash, 1 + j*16, 16)
      |            for j in range(0, 4)]) AS block
      |  FROM code),
      |-- same bounded-bucket candidate generation as operators.Buckets
      |bc AS (SELECT block FROM blocks GROUP BY block HAVING COUNT(*) BETWEEN 2 AND 500)
      |SELECT DISTINCT a.doc_id AS doc_id_1, b2.doc_id AS doc_id_2, a.phash AS phash_1,
      |  CAST(64 - len(list_filter(range(1, 65),
      |           i -> substr(a.phash, i, 1) = substr(b2.phash, i, 1))) AS BIGINT) AS hamming
      |FROM blocks a JOIN blocks b2 ON a.block = b2.block AND a.doc_id < b2.doc_id
      |JOIN bc ON a.block = bc.block
      |WHERE 64 - len(list_filter(range(1, 65),
      |        i -> substr(a.phash, i, 1) = substr(b2.phash, i, 1))) <= 3""".stripMargin

  /** streaming_dedup_phash twin: new-vs-corpus pairs only, bucket cap
    * on the CORPUS block size — the arrival-order-independent streaming
    * contract (a verdict for an arriving image cannot depend on images
    * arriving after it), mirroring the minhash streaming twin.
    */
  val streamingDedupPhash: String =
    s"""WITH $phashCtes,
       |corpus AS (SELECT * FROM blocks WHERE doc_id % 7 <> 0),
       |batch AS (SELECT * FROM blocks WHERE doc_id % 7 = 0),
       |bc AS (SELECT block FROM corpus GROUP BY block HAVING COUNT(*) BETWEEN 1 AND 500)
       |SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_id_1,
       |  greatest(a.doc_id, b.doc_id) AS doc_id_2,
       |  CAST(64 - len(list_filter(range(1, 65),
       |           i -> substr(a.phash, i, 1) = substr(b.phash, i, 1))) AS BIGINT) AS hamming
       |FROM batch a JOIN corpus b USING (block) JOIN bc USING (block)
       |WHERE 64 - len(list_filter(range(1, 65),
       |        i -> substr(a.phash, i, 1) = substr(b.phash, i, 1))) <= 3""".stripMargin

  /** dedup_video_phash twin: replays the textured-VIDEO generator's
    * contract (frame count from the digest, frame f's pattern at
    * brightness shift + f), the per-sampled-frame aHash arithmetic,
    * the (frame, block) banding, and the majority-frame-match rule —
    * all from sha256(text), never decoding a container.
    */
  val dedupVideoPhash: String =
    """WITH base AS (
      |  SELECT doc_id, text, 0 AS shift FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text, 8 AS shift
      |  FROM documents WHERE doc_id % 10 = 0),
      |hx AS (
      |  SELECT doc_id, shift,
      |    ascii(substr(sha256(text), 1, 1)) AS a, ascii(substr(sha256(text), 2, 1)) AS b,
      |    ascii(substr(sha256(text), 3, 1)) AS c, ascii(substr(sha256(text), 4, 1)) AS d,
      |    ascii(substr(sha256(text), 5, 1)) AS e, ascii(substr(sha256(text), 6, 1)) AS ff,
      |    4 + (ascii(substr(sha256(text), 1, 1)) % 8) AS n_frames
      |  FROM base),
      |fr AS (
      |  SELECT doc_id, shift, a, b, c, d, e, ff, f
      |  FROM hx CROSS JOIN range(0, 11) fs(f)
      |  WHERE f < n_frames AND f % 4 = 0),
      |px AS (
      |  SELECT doc_id, f, (y // 4) * 8 + (x // 4) AS j,
      |    32 + ((a * x + b * y + c * x * y + d + e * x * x + ff * y * y
      |           + 37 * f) % 192) + shift AS g
      |  FROM fr CROSS JOIN range(0, 32) xs(x) CROSS JOIN range(0, 32) ys(y)),
      |blk AS (SELECT doc_id, f, j, SUM(g) AS bsum FROM px GROUP BY doc_id, f, j),
      |tot AS (SELECT doc_id, f, SUM(bsum) AS total FROM blk GROUP BY doc_id, f),
      |code AS (
      |  SELECT b.doc_id, b.f,
      |    string_agg(CASE WHEN b.bsum * 64 > t.total THEN '1' ELSE '0' END, ''
      |               ORDER BY b.j) AS phash
      |  FROM blk b JOIN tot t USING (doc_id, f) GROUP BY b.doc_id, b.f),
      |blocks AS (
      |  SELECT doc_id, f, phash,
      |    unnest([CAST(f AS VARCHAR) || '|' || CAST(j AS VARCHAR) || '|'
      |            || substr(phash, 1 + j*16, 16) for j in range(0, 4)]) AS block
      |  FROM code),
      |-- same bounded-bucket candidate generation as operators.Buckets
      |bc AS (SELECT block FROM blocks GROUP BY block HAVING COUNT(*) BETWEEN 2 AND 500),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_id_1, b2.doc_id AS doc_id_2
      |  FROM blocks a JOIN blocks b2 ON a.block = b2.block AND a.doc_id < b2.doc_id
      |  JOIN bc ON a.block = bc.block),
      |ns AS (SELECT doc_id, COUNT(*) AS n_sampled FROM code GROUP BY doc_id),
      |m AS (
      |  SELECT c.doc_id_1, c.doc_id_2, COUNT(*) AS n_frames_matched
      |  FROM cand c
      |  JOIN code p1 ON p1.doc_id = c.doc_id_1
      |  JOIN code p2 ON p2.doc_id = c.doc_id_2 AND p2.f = p1.f AND p2.phash = p1.phash
      |  GROUP BY c.doc_id_1, c.doc_id_2)
      |SELECT m.doc_id_1, m.doc_id_2, m.n_frames_matched,
      |  n1.n_sampled AS n_sampled_1, n2.n_sampled AS n_sampled_2
      |FROM m
      |JOIN ns n1 ON n1.doc_id = m.doc_id_1
      |JOIN ns n2 ON n2.doc_id = m.doc_id_2
      |WHERE m.n_frames_matched * 2 > greatest(n1.n_sampled, n2.n_sampled)""".stripMargin

  /** text_bigram_lm twin: same rational N/count terms, same
    * position-ordered fold (`list_transform` then init-less
    * `list_reduce` ≡ Spark's 0.0-init left fold — first term 0.0 + x
    * is exact).
    */
  val textBigramLm: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |b2 AS (
      |  SELECT doc_id, u.pos AS pos, u.bg AS bg FROM (
      |    SELECT doc_id,
      |      unnest([{'pos': i, 'bg': array_to_string(words[i:i+1], ' ')}
      |              for i in range(1, len(words))]) AS u
      |    FROM w)),
      |wc AS (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY bg) AS c FROM b2),
      |n AS (SELECT CAST(SUM(greatest(len(words) - 1, 0)) AS DOUBLE) AS n FROM w),
      |lst AS (
      |  SELECT doc_id, list(c ORDER BY pos) AS cs, COUNT(*) AS n_bigrams
      |  FROM wc GROUP BY doc_id)
      |SELECT d.doc_id,
      |  COALESCE(l.n_bigrams, 0) AS n_bigrams,
      |  round(list_reduce(list_transform(l.cs, c -> n.n / c), (a, b) -> a + b)
      |        / l.n_bigrams, 6) AS mean_inv_freq
      |FROM documents d
      |LEFT JOIN lst l USING (doc_id)
      |CROSS JOIN n""".stripMargin

  val textRollingFingerprint: String =
    """SELECT doc_id,
      |  CASE WHEN length(text) = 0 THEN 0
      |       ELSE list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
      |                        (acc, x) -> (acc * 31 + x) % 1000000007) END AS rhash
      |FROM documents""".stripMargin

  val textBpeTokens: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
      |  CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_distinct_tokens
      |FROM documents""".stripMargin

  /** Shared double-cast corpus + left-fold cosine helper macro text. */
  private val vecsDouble =
    """v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |      FROM embeddings)""".stripMargin

  private def cosine(a: String, b: String): String =
    s"""(list_reduce([$a[i] * $b[i] for i in range(1, len($a) + 1)], (acc, x) -> acc + x)
       | / (sqrt(list_reduce(list_transform($a, x -> x * x), (acc, x) -> acc + x))
       |    * sqrt(list_reduce(list_transform($b, x -> x * x), (acc, x) -> acc + x))))""".stripMargin

  val simCosineTopK: String =
    s"""WITH $vecsDouble,
       |q AS (SELECT vec_id AS query_id, vec AS q_vec FROM v WHERE vec_id % 25 = 0),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    ${cosine("q.q_vec", "c.vec")} AS score
       |  FROM v c JOIN q ON q.query_id <> c.vec_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(score, 6) AS score
       |FROM r WHERE rank <= 5""".stripMargin

  /** nBits hyperplane signature: r_j[i] = ((i*31 + j*17) % 61) - 30
    * (modulus must exceed the widest signature — the family is periodic
    * in j with period = modulus, so mod 7 gave only 7 distinct planes).
    */
  private def signature(v: String, nBits: Int = 8): String =
    s"""array_to_string(
       |  [CASE WHEN list_reduce(
       |          [$v[i] * CAST(((i * 31 + j * 17) % 61) - 30 AS DOUBLE)
       |           for i in range(1, len($v) + 1)],
       |          (acc, x) -> acc + x) >= 0
       |        THEN '1' ELSE '0' END for j in range(0, $nBits)], '')""".stripMargin

  /** Banded-LSH ANN twin (8 bands × 3 bits, candidate = any band match,
    * DISTINCT before the exact re-score — mirrors Similarity.lshTopK).
    */
  val simAnnLshTopK: String =
    s"""WITH $vecsDouble,
       |s AS (SELECT vec_id, vec, ${signature("vec", 24)} AS sig FROM v),
       |blocks AS (
       |  SELECT vec_id, vec,
       |    unnest([CAST(b AS VARCHAR) || '|' || substr(sig, 1 + b * 3, 3)
       |            for b in range(0, 8)]) AS band
       |  FROM s),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM blocks c JOIN blocks q
       |    ON q.band = c.band AND q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    ${cosine("q.vec", "c.vec")} AS score
       |  FROM cand
       |  JOIN v q ON q.vec_id = cand.query_id
       |  JOIN v c ON c.vec_id = cand.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(score, 6) AS score
       |FROM r WHERE rank <= 5""".stripMargin

  /** kNN-graph twin (8 bands × 6 bits over the whole corpus, directed
    * top-5 per node, then canonical undirected edges with the mutual
    * flag; `min(score)` ≡ Spark's `first` because cosine's left fold
    * is bit-symmetric, so both directions carry the identical double).
    */
  val embedKnnGraph: String =
    s"""WITH $vecsDouble,
       |s AS (SELECT vec_id, vec, ${signature("vec", 48)} AS sig FROM v),
       |blocks AS (
       |  SELECT vec_id, vec,
       |    unnest([CAST(b AS VARCHAR) || '|' || substr(sig, 1 + b * 6, 6)
       |            for b in range(0, 8)]) AS band
       |  FROM s),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS src, c.vec_id AS dst
       |  FROM blocks a JOIN blocks c
       |    ON a.band = c.band AND a.vec_id <> c.vec_id),
       |scored AS (
       |  SELECT cand.src, cand.dst, ${cosine("q.vec", "c.vec")} AS score
       |  FROM cand
       |  JOIN v q ON q.vec_id = cand.src
       |  JOIN v c ON c.vec_id = cand.dst),
       |r AS (
       |  SELECT src, dst, score,
       |    ROW_NUMBER() OVER (PARTITION BY src
       |      ORDER BY score DESC NULLS LAST, dst ASC NULLS FIRST) AS rank
       |  FROM scored),
       |t AS (SELECT src, dst, score FROM r WHERE rank <= 5),
       |e AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
       |        count(*) AS ndir, min(score) AS score
       |      FROM t GROUP BY 1, 2)
       |SELECT a AS src, b AS dst, ndir = 2 AS mutual,
       |  round(score, 6) AS score
       |FROM e""".stripMargin

  /** Incremental-kNN twin: the BATCH recompute over the final corpus
    * (4 bands × 10 bits, directed top-5) — incremental ≡ batch is the
    * claim, so the oracle is deliberately the non-incremental form.
    */
  val embedKnnIncremental: String =
    s"""WITH $vecsDouble,
       |s AS (SELECT vec_id, vec, ${signature("vec", 40)} AS sig FROM v),
       |blocks AS (
       |  SELECT vec_id, vec,
       |    unnest([CAST(b AS VARCHAR) || '|' || substr(sig, 1 + b * 10, 10)
       |            for b in range(0, 4)]) AS band
       |  FROM s),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS src, c.vec_id AS dst
       |  FROM blocks a JOIN blocks c
       |    ON a.band = c.band AND a.vec_id <> c.vec_id),
       |scored AS (
       |  SELECT cand.src, cand.dst, ${cosine("q.vec", "c.vec")} AS score
       |  FROM cand
       |  JOIN v q ON q.vec_id = cand.src
       |  JOIN v c ON c.vec_id = cand.dst),
       |r AS (
       |  SELECT src, dst, score,
       |    ROW_NUMBER() OVER (PARTITION BY src
       |      ORDER BY score DESC NULLS LAST, dst ASC NULLS FIRST) AS rank
       |  FROM scored)
       |SELECT src, dst, round(score, 6) AS score FROM r WHERE rank <= 5""".stripMargin

  /** One propagate + pointer-jump round — the unrolled twin of
    * ConnectedComponents.labelPropagateJump: a neighbor-min step,
    * then every vertex re-reads its own label's label (c(c(v))).
    */
  private def ccJumpIter(i: Int): String =
    s"""p$i AS MATERIALIZED (
       |  SELECT s.src AS id, MIN(l.component) AS component
       |  FROM sym s JOIN l${i - 1} l ON l.id = s.dst
       |  GROUP BY s.src),
       |l$i AS MATERIALIZED (
       |  SELECT p.id, MIN(p2.component) AS component
       |  FROM p$i p JOIN p$i p2 ON p2.id = p.component
       |  GROUP BY p.id)""".stripMargin

  /** Communities over the mutual-kNN edge set: 8 unrolled
    * propagate+jump rounds (the gate require()s convergence at 8, so
    * these ARE the components — O(log diameter) convergence covers
    * the sf0.1 mutual graph the plain 8-round form could not), then
    * per-component size + intra-edge count.
    */
  val embedKnnCommunities: String =
    s"""WITH g AS MATERIALIZED (SELECT src, dst FROM ($embedKnnGraph) WHERE mutual),
       |verts AS (SELECT src AS id FROM g UNION SELECT dst FROM g),
       |sym AS MATERIALIZED (SELECT src, dst FROM g
       |        UNION SELECT dst AS src, src AS dst FROM g
       |        UNION SELECT id AS src, id AS dst FROM verts),
       |l0 AS (SELECT id, id AS component FROM verts),
       |${(1 to 8).map(ccJumpIter).mkString(",\n")},
       |sizes AS (SELECT component, COUNT(*) AS n_nodes FROM l8 GROUP BY 1),
       |ec AS (SELECT l.component, COUNT(*) AS n_edges
       |       FROM g JOIN l8 l ON l.id = g.src GROUP BY 1)
       |SELECT s.component, CAST(s.n_nodes AS BIGINT) AS n_nodes,
       |  CAST(ec.n_edges AS BIGINT) AS n_edges
       |FROM sizes s JOIN ec USING (component)""".stripMargin

  private val activityCols = Seq(
    "account_id", "activity_date", "activity_time", "next_activity_date",
    "collection_channel", "contact_type", "contact_outcome", "non_payment_reason",
    "contact_location", "next_action", "notes", "phone_number", "department",
    "agent_name", "src_seq")

  val qaProfileActivities: String = {
    val aggs = activityCols.map(c =>
      s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_$c, COUNT(DISTINCT $c) AS dist_$c")
      .mkString(",\n  ")
    val arms = activityCols.map(c =>
      s"SELECT '$c' AS column_name, n AS n_rows, nulls_$c AS n_nulls, dist_$c AS n_distinct FROM b")
      .mkString("\nUNION ALL ")
    s"""WITH ${DeriveSql.stgActivities},
       |b AS (SELECT COUNT(*) AS n,
       |  $aggs
       |  FROM stg_activities)
       |$arms""".stripMargin
  }

  /** qa_profile_activities (KMV default) twin: per column, the k=64
    * smallest distinct 13-hex md5 prefixes; exact count when < k,
    * else 63 / (v_k / 2^52) with v_k from a digit-Horner fold — the
    * identical arithmetic KmvDistinctAgg performs, so the APPROXIMATE
    * profile hash-gates (HLL could not).
    */
  val qaProfileActivitiesKmv: String = {
    val nullAggs = activityCols.map(c =>
      s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_$c")
      .mkString(",\n  ")
    val dCtes = activityCols.map(c =>
      s"""d_$c AS (SELECT DISTINCT substr(md5(CAST($c AS VARCHAR)), 1, 13) AS p
         |  FROM stg_activities WHERE $c IS NOT NULL)""".stripMargin).mkString(",\n")
    val arms = activityCols.map { c =>
      s"""SELECT '$c' AS column_name, n AS n_rows, nulls_$c AS n_nulls,
         |  (CASE WHEN (SELECT COUNT(*) FROM d_$c) < 64
         |        THEN CAST((SELECT COUNT(*) FROM d_$c) AS DOUBLE)
         |        ELSE 63.0 / (CAST((
         |          SELECT list_reduce([strpos('0123456789abcdef', substr(p, i, 1)) - 1
         |                              for i in range(1, 14)], (a, d) -> a * 16 + d)
         |          FROM d_$c ORDER BY p LIMIT 1 OFFSET 63) AS DOUBLE) / 4503599627370496.0)
         |   END) AS n_distinct_est
         |FROM b""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH ${DeriveSql.stgActivities},
       |b AS (SELECT COUNT(*) AS n,
       |  $nullAggs
       |  FROM stg_activities),
       |$dCtes
       |$arms""".stripMargin
  }

  /** Parity contract (holds for non-ASCII input): n_bytes = UTF-8 byte
    * length via octet_length(encode(...)), cp_sum folds code points
    * (ascii(c) = code point of a 1-char string), sha256 hashes UTF-8
    * bytes on both engines. width/height replay the PNG fixture
    * GENERATOR's digest contract — Spark reports them from an actual
    * ImageIO decode of the rendered image, so a match proves the codec
    * round trip recovered the generated dimensions.
    */
  val multimodalFeatures: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CASE WHEN length(text) = 0 THEN 0
      |       ELSE list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
      |                        (acc, x) -> (acc + x) % 1000000007) END AS cp_sum,
      |  sha256(text) AS sha256_hex,
      |  64 + (ascii(substr(sha256(text), 1, 1)) % 8) * 16 AS width,
      |  64 + (ascii(substr(sha256(text), 2, 1)) % 8) * 16 AS height,
      |  (64 + (ascii(substr(sha256(text), 1, 1)) % 8) * 16) // 2 AS thumb_w,
      |  (64 + (ascii(substr(sha256(text), 2, 1)) % 8) * 16) // 2 AS thumb_h
      |FROM documents""".stripMargin

  /** Matryoshka twin: the exact-top-k query over vec[1:8]. */
  val simMatryoshkaTopK: String =
    s"""WITH v AS (SELECT vec_id,
       |             (list_transform(embedding, x -> CAST(x AS DOUBLE)))[1:8] AS vec
       |           FROM embeddings),
       |q AS (SELECT vec_id AS query_id, vec AS q_vec FROM v WHERE vec_id % 25 = 0),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    ${cosine("q.q_vec", "c.vec")} AS score
       |  FROM v c JOIN q ON q.query_id <> c.vec_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(score, 6) AS score
       |FROM r WHERE rank <= 5""".stripMargin

  val simIvfTopK: String =
    s"""WITH $vecsDouble,
       |c AS (SELECT vec_id AS cid, vec AS cvec FROM v WHERE vec_id < 8),
       |lists AS (
       |  SELECT vec_id AS neighbor_id, vec AS c_vec, cid FROM (
       |    SELECT x.vec_id, x.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${cosine("x.vec", "c.cvec")} DESC NULLS LAST, c.cid ASC NULLS FIRST) AS rn
       |    FROM v x CROSS JOIN c)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, q_vec, cid FROM (
       |    SELECT q.vec_id AS query_id, q.vec AS q_vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosine("q.vec", "c.cvec")} DESC NULLS LAST, c.cid ASC NULLS FIRST) AS rn
       |    FROM v q CROSS JOIN c WHERE q.vec_id % 25 = 0)
       |  WHERE rn <= 2),
       |scored AS (
       |  SELECT p.query_id, l.neighbor_id, ${cosine("p.q_vec", "l.c_vec")} AS score
       |  FROM lists l JOIN probes p USING (cid)
       |  WHERE p.query_id <> l.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(score, 6) AS score
       |FROM r WHERE rank <= 5""".stripMargin

  /** Squared-L2 as a left fold in array order — bit-identical to Spark's
    * `aggregate(zip_with(v, c, (x,y) -> (x-y)*(x-y)), 0.0, _+_)` (the
    * 0.0 init is exact, so fold-without-init matches).
    */
  private def sqDist(a: String, b: String): String =
    s"""list_reduce([($a[i] - $b[i]) * ($a[i] - $b[i]) for i in range(1, len($a) + 1)],
       |     (acc, x) -> acc + x)""".stripMargin

  /** One unrolled Lloyd iteration (operators.KMeans.fit is deterministic —
    * fixed init, left-fold distances, fixed-point means — so each
    * iteration is plain SQL):
    * assign aN = arg-min d2 over centroids c(N-1), ties -> lowest cid;
    * update cN = (SUM(CAST(round(x*1e6) AS BIGINT)) / n) / 1e6 per
    * component (empty clusters keep their previous centroid).
    */
  private def kmeansIter(i: Int, src: String = "v", p: String = ""): String = {
    val prev = s"${p}c${i - 1}"
    s"""${p}a$i AS (
       |  SELECT id, vec, cid FROM (
       |    SELECT x.vec_id AS id, x.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${sqDist("x.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM $src x CROSS JOIN $prev c)
       |  WHERE rn = 1),
       |${p}u$i AS (
       |  SELECT cid, list((CAST(s AS DOUBLE) / n) / 1000000.0 ORDER BY idx) AS centroid
       |  FROM (
       |    SELECT cid, idx, SUM(fx) AS s
       |    FROM (SELECT cid,
       |            unnest(range(1, len(vec) + 1)) AS idx,
       |            unnest(list_transform(vec, x -> CAST(round(x * 1000000.0) AS BIGINT))) AS fx
       |          FROM ${p}a$i)
       |    GROUP BY cid, idx)
       |  JOIN (SELECT cid, COUNT(*) AS n FROM ${p}a$i GROUP BY cid) USING (cid)
       |  GROUP BY cid),
       |${p}c$i AS (
       |  SELECT p.cid, COALESCE(u.centroid, p.centroid) AS centroid
       |  FROM $prev p LEFT JOIN ${p}u$i u USING (cid))""".stripMargin
  }

  /** sample_diversity_quota twin: the same 3 unrolled Lloyd iterations
    * and rn=1 assignment as [[simIvfKmeansTopK]], then a per-cell
    * ROW_NUMBER in md5-digest order capped at the quota.
    */
  val sampleDiversityQuota: String =
    s"""WITH $vecsDouble,
       |c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC NULLS FIRST) - 1 AS INTEGER) AS cid,
       |         vec AS centroid
       |  FROM (SELECT vec_id, vec FROM v ORDER BY vec_id ASC NULLS FIRST LIMIT 8)),
       |${(1 to 3).map(kmeansIter(_)).mkString(",\n")},
       |assigned AS (
       |  SELECT id, cid FROM (
       |    SELECT x.vec_id AS id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${sqDist("x.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM v x CROSS JOIN c3 c)
       |  WHERE rn = 1)
       |SELECT cid, vec_id, sample_key, pick_rank FROM (
       |  SELECT cid, id AS vec_id, md5(CAST(id AS VARCHAR)) AS sample_key,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY cid
       |      ORDER BY md5(CAST(id AS VARCHAR)) ASC NULLS FIRST,
       |               id ASC NULLS FIRST) AS BIGINT) AS pick_rank
       |  FROM assigned)
       |WHERE pick_rank <= 10""".stripMargin

  /** sim_ivf_kmeans_topk twin: 3 unrolled Lloyd iterations (init = the 8
    * lowest-id vectors, cid = rank order), then the IVF probe/score shape
    * of simIvfTopK but with L2 probe ranking and the TRAINED c3 centroids
    * (mirrors KMeans.probe: nprobe=1 lists, nprobe=2 queries).
    */
  val simIvfKmeansTopK: String =
    s"""WITH $vecsDouble,
       |c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC NULLS FIRST) - 1 AS INTEGER) AS cid,
       |         vec AS centroid
       |  FROM (SELECT vec_id, vec FROM v ORDER BY vec_id ASC NULLS FIRST LIMIT 8)),
       |${(1 to 3).map(kmeansIter(_)).mkString(",\n")},
       |lists AS (
       |  SELECT id AS neighbor_id, vec AS c_vec, cid FROM (
       |    SELECT x.vec_id AS id, x.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${sqDist("x.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM v x CROSS JOIN c3 c)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT id AS query_id, vec AS q_vec, cid FROM (
       |    SELECT q.vec_id AS id, q.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${sqDist("q.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM v q CROSS JOIN c3 c WHERE q.vec_id % 25 = 0)
       |  WHERE rn <= 2),
       |scored AS (
       |  SELECT p.query_id, l.neighbor_id, ${cosine("p.q_vec", "l.c_vec")} AS score
       |  FROM lists l JOIN probes p USING (cid)
       |  WHERE p.query_id <> l.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(score, 6) AS score
       |FROM r WHERE rank <= 5""".stripMargin

  /** sim_ivf_append_topk twin: the FULL REBUILD the incremental path
    * must equal — 3 Lloyd iterations trained on the CORPUS split only
    * (`vc`, vec_id % 7 <> 0: the frozen stored centroids), then ONE
    * assignment of EVERY vector (corpus ∪ batch) under c3. Because
    * assignment under fixed centroids is per-vector, this is exactly
    * stored-corpus lists ∪ appended-batch lists, which is what makes
    * the Spark side's storage round trip + append load-bearing.
    */
  val simIvfAppendTopK: String =
    s"""WITH $vecsDouble,
       |vc AS (SELECT * FROM v WHERE vec_id % 7 <> 0),
       |c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC NULLS FIRST) - 1 AS INTEGER) AS cid,
       |         vec AS centroid
       |  FROM (SELECT vec_id, vec FROM vc ORDER BY vec_id ASC NULLS FIRST LIMIT 8)),
       |${(1 to 3).map(kmeansIter(_, "vc")).mkString(",\n")},
       |lists AS (
       |  SELECT id AS neighbor_id, vec AS c_vec, cid FROM (
       |    SELECT x.vec_id AS id, x.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${sqDist("x.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM v x CROSS JOIN c3 c)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT id AS query_id, vec AS q_vec, cid FROM (
       |    SELECT q.vec_id AS id, q.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${sqDist("q.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM v q CROSS JOIN c3 c WHERE q.vec_id % 25 = 0)
       |  WHERE rn <= 2),
       |scored AS (
       |  SELECT p.query_id, l.neighbor_id, ${cosine("p.q_vec", "l.c_vec")} AS score
       |  FROM lists l JOIN probes p USING (cid)
       |  WHERE p.query_id <> l.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(score, 6) AS score
       |FROM r WHERE rank <= 5""".stripMargin

  /** layout_ivf_from_feed twin: the full rebuild the feed-fed index
    * must equal — 3 Lloyd iterations trained on the v1 split only
    * (`vec_id % 3 = 0`: the frozen stored centroids), then ONE
    * assignment of the HEAD membership (v1 ∪ appended `% 3 = 1`,
    * minus the DV-deleted `% 5 = 0`) under c3. Assignment under fixed
    * centroids is per-vector, so stored-lists ∪ feed-inserts minus
    * feed-deletes must equal it exactly.
    */
  val layoutIvfFromFeed: String =
    s"""WITH $vecsDouble,
       |vc AS (SELECT * FROM v WHERE vec_id % 3 = 0),
       |c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC NULLS FIRST) - 1 AS INTEGER) AS cid,
       |         vec AS centroid
       |  FROM (SELECT vec_id, vec FROM vc ORDER BY vec_id ASC NULLS FIRST LIMIT 8)),
       |${(1 to 3).map(kmeansIter(_, "vc")).mkString(",\n")},
       |m AS (SELECT * FROM v WHERE vec_id % 3 < 2 AND vec_id % 5 <> 0),
       |lists AS (
       |  SELECT id AS neighbor_id, vec AS c_vec, cid FROM (
       |    SELECT x.vec_id AS id, x.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${sqDist("x.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM m x CROSS JOIN c3 c)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT id AS query_id, vec AS q_vec, cid FROM (
       |    SELECT q.vec_id AS id, q.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${sqDist("q.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM m q CROSS JOIN c3 c WHERE q.vec_id % 23 = 0)
       |  WHERE rn <= 2),
       |scored AS (
       |  SELECT p.query_id, l.neighbor_id, ${cosine("p.q_vec", "l.c_vec")} AS score
       |  FROM lists l JOIN probes p USING (cid)
       |  WHERE p.query_id <> l.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(score, 6) AS score
       |FROM r WHERE rank <= 5""".stripMargin

  /** sim_ivf_drift twin: the same corpus-trained c3 + full assignment,
    * grouped by list — counts split base/new by the % 7 batch rule,
    * residual means via the fixed-point trick (BIGINT sums first, one
    * double divide per group), retrain by exact integer
    * cross-multiplication.
    */
  val simIvfDrift: String =
    s"""WITH $vecsDouble,
       |vc AS (SELECT * FROM v WHERE vec_id % 7 <> 0),
       |c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC NULLS FIRST) - 1 AS INTEGER) AS cid,
       |         vec AS centroid
       |  FROM (SELECT vec_id, vec FROM vc ORDER BY vec_id ASC NULLS FIRST LIMIT 8)),
       |${(1 to 3).map(kmeansIter(_, "vc")).mkString(",\n")},
       |asgn AS (
       |  SELECT id, is_new, cid, d2 FROM (
       |    SELECT x.vec_id AS id, x.vec_id % 7 = 0 AS is_new, c.cid,
       |      ${sqDist("x.vec", "c.centroid")} AS d2,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${sqDist("x.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM v x CROSS JOIN c3 c)
       |  WHERE rn = 1),
       |g AS (
       |  SELECT cid,
       |    CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS n_base,
       |    CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       |    SUM(CASE WHEN is_new THEN 0
       |             ELSE CAST(round(d2 * 1000000.0) AS BIGINT) END) AS sb,
       |    SUM(CASE WHEN is_new THEN CAST(round(d2 * 1000000.0) AS BIGINT)
       |             ELSE 0 END) AS sn
       |  FROM asgn GROUP BY cid)
       |SELECT cid, n_base, n_new,
       |  CASE WHEN n_base > 0
       |       THEN round((CAST(sb AS DOUBLE) / n_base) / 1000000.0, 6) END AS mean_res_base,
       |  CASE WHEN n_new > 0
       |       THEN round((CAST(sn AS DOUBLE) / n_new) / 1000000.0, 6) END AS mean_res_new,
       |  (n_new * 2 > n_base) OR
       |    (n_base > 0 AND n_new > 0 AND sn * n_base > sb * n_new * 2) AS retrain
       |FROM g""".stripMargin

  /** One maintain-branch result: assign `$src` under `$cCte`, probe the
    * % 25 queries (nprobe 2), score, rank top-5, stamp the decision
    * column — all guarded by the trigger subquery, so exactly one
    * branch of the final union is live and WHICH one is part of the
    * hashed result.
    */
  private def ivfRankBranch(src: String, cCte: String, p: String,
                            retrained: String, guard: String): String =
    s"""${p}lists AS (
       |  SELECT id AS neighbor_id, vec AS c_vec, cid FROM (
       |    SELECT x.vec_id AS id, x.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${sqDist("x.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM $src x CROSS JOIN $cCte c)
       |  WHERE rn = 1),
       |${p}probes AS (
       |  SELECT id AS query_id, vec AS q_vec, cid FROM (
       |    SELECT q.vec_id AS id, q.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${sqDist("q.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM $src q CROSS JOIN $cCte c WHERE q.vec_id % 25 = 0)
       |  WHERE rn <= 2),
       |${p}scored AS (
       |  SELECT p.query_id, l.neighbor_id, ${cosine("p.q_vec", "l.c_vec")} AS score
       |  FROM ${p}lists l JOIN ${p}probes p USING (cid)
       |  WHERE p.query_id <> l.neighbor_id),
       |${p}res AS (
       |  SELECT query_id, rank, neighbor_id, round(score, 6) AS score,
       |         $retrained AS retrained
       |  FROM (
       |    SELECT query_id, neighbor_id, score,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rank
       |    FROM ${p}scored)
       |  WHERE rank <= 5 AND $guard)""".stripMargin

  /** The drift trigger over the would-be state (corpus lists + batch
    * assigned under the frozen c3): the same exact-integer sums as the
    * sim_ivf_drift twin, reduced to ONE boolean — the decision
    * `IvfIndex.maintain` branches on.
    */
  private def ivfTrigger(src: String, isNew: String): String =
    s"""asgn AS (
       |  SELECT id, is_new, cid, d2 FROM (
       |    SELECT x.vec_id AS id, $isNew AS is_new, c.cid,
       |      ${sqDist("x.vec", "c.centroid")} AS d2,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${sqDist("x.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM $src x CROSS JOIN c3 c)
       |  WHERE rn = 1),
       |g AS (
       |  SELECT cid,
       |    CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS n_base,
       |    CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       |    SUM(CASE WHEN is_new THEN 0
       |             ELSE CAST(round(d2 * 1000000.0) AS BIGINT) END) AS sb,
       |    SUM(CASE WHEN is_new THEN CAST(round(d2 * 1000000.0) AS BIGINT)
       |             ELSE 0 END) AS sn
       |  FROM asgn GROUP BY cid),
       |trig AS (
       |  SELECT COALESCE(bool_or((n_new * 2 > n_base) OR
       |    (n_base > 0 AND n_new > 0 AND sn * n_base > sb * n_new * 2)), FALSE) AS t
       |  FROM g)""".stripMargin

  /** sim_ivf_maintain_topk twin: corpus-trained c3, the drift trigger
    * over corpus ∪ batch, then BOTH branches — fold (assignment under
    * the frozen c3) and retrain (fresh Lloyd iterations over the
    * union) — each guarded by the trigger, so the oracle replays the
    * DECISION, not a branch assumed in advance. On this fixture the
    * trigger is false and the append branch is the live one.
    */
  val simIvfMaintainTopK: String =
    s"""WITH $vecsDouble,
       |vc AS (SELECT * FROM v WHERE vec_id % 7 <> 0),
       |c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC NULLS FIRST) - 1 AS INTEGER) AS cid,
       |         vec AS centroid
       |  FROM (SELECT vec_id, vec FROM vc ORDER BY vec_id ASC NULLS FIRST LIMIT 8)),
       |${(1 to 3).map(kmeansIter(_, "vc")).mkString(",\n")},
       |${ivfTrigger("v", "x.vec_id % 7 = 0")},
       |rc0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC NULLS FIRST) - 1 AS INTEGER) AS cid,
       |         vec AS centroid
       |  FROM (SELECT vec_id, vec FROM v ORDER BY vec_id ASC NULLS FIRST LIMIT 8)),
       |${(1 to 3).map(kmeansIter(_, "v", "r")).mkString(",\n")},
       |${ivfRankBranch("v", "c3", "ap", "FALSE", "NOT (SELECT t FROM trig)")},
       |${ivfRankBranch("v", "rc3", "rt", "TRUE", "(SELECT t FROM trig)")}
       |SELECT * FROM apres UNION ALL SELECT * FROM rtres""".stripMargin

  /** sim_ivf_maintain_retrain twin: the same decision-replaying shape,
    * but the % 7 batch's embeddings are shifted +3.0 per component —
    * the trigger fires (appended residuals dwarf the base) and the
    * RETRAIN branch (fresh Lloyd iterations over corpus ∪ drifted
    * batch, init = the union's 8 lowest ids) is the live one.
    */
  val simIvfMaintainRetrain: String =
    s"""WITH $vecsDouble,
       |vc AS (SELECT * FROM v WHERE vec_id % 7 <> 0),
       |vb AS (
       |  SELECT vec_id, [vec[i] + 3.0 for i in range(1, len(vec) + 1)] AS vec
       |  FROM v WHERE vec_id % 7 = 0),
       |v2 AS (SELECT * FROM vc UNION ALL SELECT * FROM vb),
       |c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC NULLS FIRST) - 1 AS INTEGER) AS cid,
       |         vec AS centroid
       |  FROM (SELECT vec_id, vec FROM vc ORDER BY vec_id ASC NULLS FIRST LIMIT 8)),
       |${(1 to 3).map(kmeansIter(_, "vc")).mkString(",\n")},
       |${ivfTrigger("v2", "x.vec_id % 7 = 0")},
       |rc0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC NULLS FIRST) - 1 AS INTEGER) AS cid,
       |         vec AS centroid
       |  FROM (SELECT vec_id, vec FROM v2 ORDER BY vec_id ASC NULLS FIRST LIMIT 8)),
       |${(1 to 3).map(kmeansIter(_, "v2", "r")).mkString(",\n")},
       |${ivfRankBranch("v2", "c3", "ap", "FALSE", "NOT (SELECT t FROM trig)")},
       |${ivfRankBranch("v2", "rc3", "rt", "TRUE", "(SELECT t FROM trig)")}
       |SELECT * FROM apres UNION ALL SELECT * FROM rtres""".stripMargin

  /** Int8-quantization twin: q = round(x / (max|x|/127)) as exact-integer
    * doubles (every product/sum < 2^53, so the double folds are
    * bit-identical to Spark's tinyint→double scoring path).
    */
  val simQuantizedTopK: String =
    s"""WITH $vecsDouble,
       |qz AS (
       |  SELECT vec_id,
       |    list_transform(vec, x -> CAST(CAST(round(x / s) AS BIGINT) AS DOUBLE)) AS q
       |  FROM (
       |    SELECT vec_id, vec,
       |      CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS s
       |    FROM (SELECT vec_id, vec,
       |            list_reduce(list_transform(vec, x -> abs(x)), (a, b) -> greatest(a, b)) AS m
       |          FROM v))),
       |qq AS (SELECT vec_id AS query_id, q AS q_vec FROM qz WHERE vec_id % 25 = 0),
       |scored AS (
       |  SELECT qq.query_id, c.vec_id AS neighbor_id,
       |    ${cosine("qq.q_vec", "c.q")} AS score
       |  FROM qz c JOIN qq ON qq.query_id <> c.vec_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(score, 6) AS score
       |FROM r WHERE rank <= 5""".stripMargin

  /** Recall@5 twin: re-states the exact and approximate top-k queries as
    * subqueries and counts overlap per query — `n_hits` exact-integer,
    * `recall_at_5` the same single IEEE divide Spark performs.
    */
  /** sim_pq_topk twin: PQ encode (per-(vector, subspace) argmin over the
    * 16 lowest-id codebook subvectors, ties → lowest code — rn=1 over
    * `ORDER BY d2, c` replays nearest_centroid's strict-< first-min) and
    * ADC scoring. Bit-parity: dot_j / n2_j are left folds in array-index
    * order; the j-sums fold in j order via `list(x ORDER BY j)` (Spark's
    * exact-0.0-init fold equals the init-free list_reduce); the final
    * divide is dot / (q_norm · sqrt(n2)) in that op order.
    */
  val simPqTopK: String =
    s"""WITH $vecsDouble,
       |cb AS (SELECT vec_id AS c, vec FROM v WHERE vec_id < 16),
       |sv AS (SELECT c, j, vec[j*8+1 : j*8+8] AS sub FROM cb CROSS JOIN range(0, 8) r(j)),
       |xs AS (SELECT vec_id, j, vec[j*8+1 : j*8+8] AS sub FROM v CROSS JOIN range(0, 8) r(j)),
       |codes AS (
       |  SELECT vec_id, j, code FROM (
       |    SELECT x.vec_id, x.j, s.c AS code,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id, x.j
       |        ORDER BY ${sqDist("x.sub", "s.sub")} ASC NULLS LAST, s.c ASC NULLS FIRST) AS rn
       |    FROM xs x JOIN sv s ON s.j = x.j) WHERE rn = 1),
       |qn AS (
       |  SELECT vec_id AS query_id, vec AS q_vec,
       |    sqrt(list_reduce(list_transform(vec, x -> x * x), (a, x) -> a + x)) AS q_norm
       |  FROM v WHERE vec_id % 25 = 0),
       |parts AS (
       |  SELECT qn.query_id, k.vec_id AS neighbor_id, k.j, qn.q_norm,
       |    list_reduce([qn.q_vec[k.j*8 + i] * s.sub[i] for i in range(1, 9)],
       |                (a, x) -> a + x) AS dot_j,
       |    list_reduce(list_transform(s.sub, x -> x * x), (a, x) -> a + x) AS n2_j
       |  FROM codes k JOIN sv s ON s.j = k.j AND s.c = k.code
       |  CROSS JOIN qn WHERE qn.query_id <> k.vec_id),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    list_reduce(list(dot_j ORDER BY j), (a, x) -> a + x)
       |      / (MIN(q_norm) * sqrt(list_reduce(list(n2_j ORDER BY j), (a, x) -> a + x))) AS score
       |  FROM parts GROUP BY query_id, neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(score, 6) AS score
       |FROM r WHERE rank <= 5""".stripMargin

  /** text_substring_spans twin: duplicated 8-word windows (md5-keyed,
    * like the Spark shuffle) → per-doc gaps-and-islands merge. The
    * NULL-lag CASE falls to the ELSE branch on the first row in both
    * engines (NULL ≤ 8 is not true), so island numbering matches.
    */
  val textSubstringSpans: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |wins0 AS (
      |  SELECT doc_id,
      |    unnest([{'p': p, 'dig': md5(array_to_string(w[p : p+7], ' '))}
      |            for p in range(1, len(w) - 6)]) AS s
      |  FROM toks WHERE len(w) >= 8),
      |wins AS (SELECT doc_id, s.p AS p, s.dig AS dig FROM wins0),
      |dup AS (SELECT dig FROM wins GROUP BY dig HAVING COUNT(*) >= 2),
      |marked AS (SELECT doc_id, p FROM wins JOIN dup USING (dig)),
      |isl AS (
      |  SELECT doc_id, p,
      |    CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8
      |         THEN 0 ELSE 1 END AS brk
      |  FROM marked),
      |isl2 AS (
      |  SELECT doc_id, p,
      |    CAST(SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
      |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span_idx
      |  FROM isl),
      |sp AS (
      |  SELECT doc_id, span_idx, MIN(p) AS start_pos, MAX(p) + 7 AS end_pos
      |  FROM isl2 GROUP BY doc_id, span_idx)
      |SELECT doc_id, span_idx, start_pos, end_pos,
      |  end_pos - start_pos + 1 AS n_words
      |FROM sp""".stripMargin

  /** text_substring_extend twin: the planted variable-length repeats
    * (words 3..L+2 of every 10th doc, L = 33/17/9 by doc_id % 30),
    * then seed pairs sharing an 8-window digest chained along
    * diagonals (pb − pa) into maximal runs — the same
    * gaps-and-islands arithmetic as the engine, with the identical
    * ≥2/≤1000 posting bounds. The NULL-lag CASE breaks on the first
    * row of every diagonal in both engines (NULL = 1 is not true).
    */
  private val substringExtendCtes: String =
    """aug AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id,
      |    COALESCE(array_to_string(
      |      ws[3 : 2 + (CASE WHEN doc_id % 30 = 0 THEN 33
      |                       WHEN doc_id % 30 = 10 THEN 17
      |                       ELSE 9 END)], ' '), '') AS text
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE doc_id % 10 = 0),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM aug),
      |wins0 AS (
      |  SELECT doc_id,
      |    unnest([{'p': p, 'dig': md5(array_to_string(w[p : p+7], ' '))}
      |            for p in range(1, len(w) - 6)]) AS s
      |  FROM toks WHERE len(w) >= 8),
      |wins AS (SELECT doc_id, s.p AS p, s.dig AS dig FROM wins0),
      |ok AS (SELECT dig FROM wins GROUP BY dig
      |       HAVING COUNT(*) >= 2 AND COUNT(*) <= 1000),
      |m AS (SELECT w.doc_id, w.p, w.dig FROM wins w JOIN ok USING (dig)),
      |seeds AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.p AS pa,
      |         b.p - a.p AS diag
      |  FROM m a JOIN m b USING (dig)
      |  WHERE a.doc_id < b.doc_id OR (a.doc_id = b.doc_id AND a.p < b.p)),
      |isl AS (
      |  SELECT doc_a, doc_b, pa, diag,
      |    CASE WHEN pa - lag(pa) OVER (PARTITION BY doc_a, doc_b, diag
      |                                 ORDER BY pa) = 1
      |         THEN 0 ELSE 1 END AS brk
      |  FROM seeds),
      |isl2 AS (
      |  SELECT doc_a, doc_b, pa, diag,
      |    CAST(SUM(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa
      |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_idx
      |  FROM isl),
      |runs AS (
      |  SELECT doc_a, doc_b, MIN(pa) AS a_start, MIN(pa) + diag AS b_start,
      |    MAX(pa) - MIN(pa) + 8 AS len_words
      |  FROM isl2 GROUP BY doc_a, doc_b, diag, run_idx)""".stripMargin

  val textSubstringExtend: String =
    s"""WITH $substringExtendCtes
       |SELECT doc_a, doc_b, a_start, b_start, len_words FROM runs""".stripMargin

  /** text_substring_cut twin: the extension chain's maximal runs
    * turned into doc_b-side cut intervals, positions marked by a
    * doc-keyed BETWEEN join, survivors reassembled in position order
    * (string_agg ORDER BY p — the engine's array_sort(struct(p, w))).
    */
  val textSubstringCut: String =
    s"""WITH $substringExtendCtes,
       |cuts AS (SELECT doc_b AS doc_id, b_start AS s,
       |  b_start + len_words - 1 AS e FROM runs),
       |tokv AS (
       |  SELECT doc_id, unnest(range(1, len(w) + 1)) AS p, w FROM toks),
       |tokw AS (SELECT doc_id, p, w[p] AS word FROM tokv),
       |cutpos AS (
       |  SELECT DISTINCT t.doc_id, t.p
       |  FROM tokw t JOIN cuts c ON t.doc_id = c.doc_id
       |   AND t.p BETWEEN c.s AND c.e),
       |kept AS (
       |  SELECT v.doc_id, v.p, v.word FROM tokw v
       |  WHERE NOT EXISTS (SELECT 1 FROM cutpos cp
       |    WHERE cp.doc_id = v.doc_id AND cp.p = v.p)),
       |rebuilt AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |    string_agg(word, ' ' ORDER BY p) AS clean_text
       |  FROM kept GROUP BY doc_id)
       |SELECT a.doc_id,
       |  CAST(len(string_split(a.text, ' ')) AS BIGINT) AS n_words,
       |  CAST(len(string_split(a.text, ' ')) - COALESCE(r.n_kept, 0) AS BIGINT)
       |    AS n_cut,
       |  md5(COALESCE(r.clean_text, '')) AS clean_md5
       |FROM aug a LEFT JOIN rebuilt r USING (doc_id)""".stripMargin

  /** text_segment_dedup twin: 10-word segments (list-comprehension
    * unnest, the textSubstringSpans precedent), cross-doc duplication
    * as MIN(doc_id) <> MAX(doc_id) over the segment partition (the
    * same O(1)-state window the engine plans), reassembly via ordered
    * string_agg. The +2M planted copies drop their first 10 words, so
    * copy segment j == original segment j+1 (mirrored plant).
    */
  val textSegmentDedup: String =
    """WITH base AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000 AS doc_id,
      |         -- COALESCE: array_to_string([]) is NULL in DuckDB where
      |         -- Spark's array_join gives '' (short docs whose copy
      |         -- drops every word — surfaced by the sf0.1 gate only,
      |         -- sf0.01 has no <= 10-word doc among the planted ids)
      |         COALESCE(array_to_string(ws[11:len(ws)], ' '), '') AS text
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE doc_id % 10 = 0),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM base),
      |segs0 AS (
      |  SELECT doc_id,
      |    unnest([{'i': i, 'seg': array_to_string(w[(i*10+1):(i*10+10)], ' ')}
      |            for i in range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))]) AS s
      |  FROM toks),
      |segs AS (SELECT doc_id, s.i AS seg_idx, s.seg AS seg FROM segs0),
      |m AS (SELECT doc_id, seg_idx, seg,
      |        MIN(doc_id) OVER (PARTITION BY seg)
      |          <> MAX(doc_id) OVER (PARTITION BY seg) AS xdoc
      |      FROM segs),
      |rebuilt AS (
      |  SELECT doc_id, COUNT(*) AS n_kept,
      |         string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text
      |  FROM m WHERE NOT xdoc GROUP BY doc_id),
      |nseg AS (SELECT doc_id, CAST(ceil(len(w) / 10.0) AS BIGINT) AS n_segments
      |         FROM toks)
      |SELECT n.doc_id, n.n_segments,
      |  CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
      |  CAST(n.n_segments - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
      |  md5(COALESCE(r.clean_text, '')) AS clean_md5
      |FROM nseg n LEFT JOIN rebuilt r USING (doc_id)""".stripMargin

  /** layout_zorder twin: the Morton interleave as unrolled shift/mask
    * terms — disjoint bit positions, so `+` equals the engine's OR.
    */
  val layoutZorder: String = {
    val terms = (0 until 21).flatMap(i => Seq(
      s"(((l_partkey >> $i) & 1) << ${2 * i + 1})",
      s"(((l_suppkey >> $i) & 1) << ${2 * i})"))
    s"""SELECT l_orderkey AS order_key, CAST(l_linenumber AS BIGINT) AS line_no,
       |  l_partkey AS part_key, l_suppkey AS supp_key,
       |  CAST(${terms.mkString(" + ")} AS BIGINT) AS zkey
       |FROM lineitem""".stripMargin
  }

  /** agg_quantile_sketch twin: the bottom-k row sample replayed as
    * ORDER BY the 13-hex md5 prefix of the row key (fixed-length hex
    * sorts like the engine's numeric hash52), quantiles as index picks
    * off the sorted sample. Both scopes come from the same sample
    * because min-k merge is lossless — which is exactly the property
    * the engine's merged-vs-direct pair proves. The dk CTE states the
    * sketch's distinct-key contract: the synthetic lineitem carries
    * duplicate (orderkey, linenumber) pairs (~6% of rows), and the
    * engine keeps one entry per hash with the MINIMUM value — rank
    * raw rows instead and the samples diverge (caught by this gate's
    * first run).
    */
  val aggQuantileSketch: String =
    """WITH keyed AS (
      |  SELECT l_returnflag AS rf,
      |    substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
      |               || CAST(l_linenumber AS VARCHAR)), 1, 13) AS h,
      |    CAST(l_extendedprice AS DOUBLE) AS v
      |  FROM lineitem),
      |dk AS (SELECT rf, h, MIN(v) AS v FROM keyed GROUP BY rf, h),
      |r AS (SELECT rf, v,
      |        ROW_NUMBER() OVER (PARTITION BY rf ORDER BY h) AS rn
      |      FROM dk),
      |samp AS (SELECT rf, list_sort(list(v)) AS vs
      |         FROM r WHERE rn <= 128 GROUP BY rf),
      |est AS (SELECT rf, CAST(len(vs) AS BIGINT) AS n_sample,
      |         vs[CAST(floor(0.25 * (len(vs) - 1)) AS BIGINT) + 1] AS p25,
      |         vs[CAST(floor(0.50 * (len(vs) - 1)) AS BIGINT) + 1] AS p50,
      |         vs[CAST(floor(0.75 * (len(vs) - 1)) AS BIGINT) + 1] AS p75
      |        FROM samp)
      |SELECT rf || '|merged' AS scope, n_sample, p25, p50, p75 FROM est
      |UNION ALL
      |SELECT rf || '|direct' AS scope, n_sample, p25, p50, p75 FROM est""".stripMargin

  /** events_rolling_distinct twin: per (type, hour) the frame is the
    * current + 2 previous OBSERVED hours (row frame over existing
    * hourly rows, like the engine's rowsBetween(-2, 0)); the estimate
    * is min-k over the frame's DISTINCT user md5 prefixes with the
    * same 63/(v_64/2^52) arithmetic — equal to the engine's
    * merge-of-stored-sketches by min-k associativity.
    */
  val eventsRollingDistinct: String = {
    def horner(expr: String): String =
      s"""CAST(list_reduce([strpos('0123456789abcdef', substr($expr, i, 1)) - 1
         |                  for i in range(1, 14)], (a, d) -> a * 16 + d) AS DOUBLE)""".stripMargin
    s"""WITH hrs AS (SELECT event_type,
       |    epoch_ns(ts) // 3600000000000 AS hr,
       |    CAST(user_id AS VARCHAR) AS uk FROM events),
       |grp AS (SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS n_events
       |        FROM hrs GROUP BY event_type, hr),
       |ranked AS (SELECT event_type, hr,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS rn
       |  FROM grp),
       |frame AS (SELECT a.event_type, a.hr, b.hr AS src_hr
       |  FROM ranked a JOIN ranked b
       |    ON a.event_type = b.event_type AND b.rn BETWEEN a.rn - 2 AND a.rn),
       |dp AS (SELECT DISTINCT f.event_type, f.hr, substr(md5(h.uk), 1, 13) AS p
       |  FROM frame f JOIN hrs h
       |    ON h.event_type = f.event_type AND h.hr = f.src_hr),
       |r AS (SELECT event_type, hr, p,
       |    ROW_NUMBER() OVER (PARTITION BY event_type, hr ORDER BY p) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type, hr) AS n
       |  FROM dp),
       |est AS (SELECT event_type, hr,
       |    CASE WHEN MAX(n) < 64 THEN CAST(MAX(n) AS DOUBLE)
       |         ELSE 63.0 / (${horner("MAX(CASE WHEN rn = 64 THEN p END)")} / 4503599627370496.0)
       |    END AS est
       |  FROM r GROUP BY event_type, hr)
       |SELECT g.event_type, g.hr, g.n_events, round(est.est, 6) AS n_users_3h_est
       |FROM grp g JOIN est ON est.event_type = g.event_type AND est.hr = g.hr""".stripMargin
  }

  /** pipeline_curriculum_bins twin: the k=128 row sample replayed as
    * ORDER BY md5(doc_id) prefix, quartile thresholds as index picks,
    * then the labeling scan with the identical <= boundary contract.
    */
  val pipelineCurriculumBins: String =
    """WITH sc AS (SELECT doc_id,
      |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
      |      / CAST(length(text) AS DOUBLE) AS score FROM documents),
      |keyed AS (SELECT doc_id, score,
      |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS h FROM sc),
      |r AS (SELECT score, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM keyed),
      |samp AS (SELECT list_sort(list(score)) AS vs FROM r WHERE rn <= 128),
      |th AS (SELECT vs[CAST(floor(0.25 * (len(vs) - 1)) AS BIGINT) + 1] AS p25,
      |              vs[CAST(floor(0.50 * (len(vs) - 1)) AS BIGINT) + 1] AS p50,
      |              vs[CAST(floor(0.75 * (len(vs) - 1)) AS BIGINT) + 1] AS p75
      |       FROM samp)
      |SELECT doc_id, round(score, 6) AS score,
      |  CASE WHEN score <= p25 THEN 'Q1' WHEN score <= p50 THEN 'Q2'
      |       WHEN score <= p75 THEN 'Q3' ELSE 'Q4' END AS bin
      |FROM sc CROSS JOIN th""".stripMargin

  /** qa_sketch_set_algebra twin: per-source and 'shared' min-64
    * sketches as sorted 13-hex prefix lists, union as concat →
    * distinct → sort → first 64 (exactly the engine's pure-column
    * merge), estimates via the standard min-k arithmetic and
    * inclusion–exclusion.
    */
  val qaSketchSetAlgebra: String = {
    def horner(expr: String): String =
      s"""CAST(list_reduce([strpos('0123456789abcdef', substr($expr, i, 1)) - 1
         |                  for i in range(1, 14)], (a, d) -> a * 16 + d) AS DOUBLE)""".stripMargin
    def est(ps: String): String =
      s"""CASE WHEN len($ps) < 64 THEN CAST(len($ps) AS DOUBLE)
         |     ELSE 63.0 / (${horner(s"$ps[64]")} / 4503599627370496.0) END""".stripMargin
    s"""WITH aug AS (SELECT source, text FROM documents
       |  UNION ALL SELECT 'shared' AS source, text FROM documents WHERE doc_id % 4 = 0),
       |h AS (SELECT DISTINCT source, substr(md5(text), 1, 13) AS p FROM aug),
       |rr AS (SELECT source, p,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY p) AS rn FROM h),
       |sk AS (SELECT source, list_sort(list(p)) AS ps FROM rr WHERE rn <= 64
       |       GROUP BY source),
       |pairs AS (SELECT a.source, a.ps AS aps, b.ps AS bps,
       |    list_sort(list_distinct(a.ps || b.ps))[1:64] AS ups
       |  FROM sk a CROSS JOIN (SELECT ps FROM sk WHERE source = 'shared') b
       |  WHERE a.source <> 'shared')
       |SELECT source,
       |  round(${est("aps")}, 6) AS est_n,
       |  round(${est("ups")}, 6) AS est_union,
       |  round((${est("aps")}) + (${est("bps")}) - (${est("ups")}), 6) AS est_inter
       |FROM pairs""".stripMargin
  }

  /** streaming_distinct_users twin: per (hour, type) min-k over the
    * hour's distinct user md5 prefixes — the streaming sketch equals
    * this because micro-batch increments merge by the same min-k path
    * as batch partials.
    */
  val streamingDistinctUsers: String = {
    def horner(expr: String): String =
      s"""CAST(list_reduce([strpos('0123456789abcdef', substr($expr, i, 1)) - 1
         |                  for i in range(1, 14)], (a, d) -> a * 16 + d) AS DOUBLE)""".stripMargin
    s"""WITH hrs AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       |    event_type, CAST(user_id AS VARCHAR) AS uk FROM events),
       |grp AS (SELECT hour, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
       |        FROM hrs GROUP BY hour, event_type),
       |dp AS (SELECT DISTINCT hour, event_type, substr(md5(uk), 1, 13) AS p FROM hrs),
       |r AS (SELECT hour, event_type, p,
       |    ROW_NUMBER() OVER (PARTITION BY hour, event_type ORDER BY p) AS rn,
       |    COUNT(*) OVER (PARTITION BY hour, event_type) AS n
       |  FROM dp),
       |est AS (SELECT hour, event_type,
       |    CASE WHEN MAX(n) < 64 THEN CAST(MAX(n) AS DOUBLE)
       |         ELSE 63.0 / (${horner("MAX(CASE WHEN rn = 64 THEN p END)")} / 4503599627370496.0)
       |    END AS est
       |  FROM r GROUP BY hour, event_type)
       |SELECT g.hour, g.event_type, g.n_events, round(est.est, 6) AS n_users_est
       |FROM grp g JOIN est ON est.hour = g.hour AND est.event_type = g.event_type""".stripMargin
  }

  /** qa_cms_freq twin: rebuild the probed Count-Min CELLS from exact
    * word counts — for each (probe, row) the cell value is the summed
    * count of every word whose row-hash lands in the probe's bucket,
    * and the estimate is the min over rows. Same md5("r|key") hash as
    * the engine (Horner fold, mod w), so update, vec_sum merge and
    * bucket layout are all under the gate. merged == direct by
    * integer-vector-add associativity; the oracle states them from
    * one definition.
    */
  val qaCmsFreq: String = {
    def horner(expr: String): String =
      s"""CAST(list_reduce([strpos('0123456789abcdef', substr($expr, i, 1)) - 1
         |                  for i in range(1, 14)], (a, d) -> a * 16 + d) AS BIGINT)""".stripMargin
    val probeList = Seq("the", "data", "key", "fast", "table", "row", "join", "spark")
      .map(q => s"'$q'").mkString(", ")
    s"""WITH wrd AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM wrd GROUP BY w),
       |rws AS (SELECT unnest([0, 1, 2, 3]) AS r),
       |bk AS (SELECT r, w, c,
       |         ${horner("md5(CAST(r AS VARCHAR) || '|' || w)")} % 64 AS b
       |       FROM wc CROSS JOIN rws),
       |probes AS (SELECT unnest([$probeList]) AS q),
       |pb AS (SELECT q, r,
       |         ${horner("md5(CAST(r AS VARCHAR) || '|' || q)")} % 64 AS b
       |       FROM probes CROSS JOIN rws),
       |cell AS (SELECT pb.q, pb.r, CAST(COALESCE(SUM(bk.c), 0) AS BIGINT) AS cnt
       |         FROM pb LEFT JOIN bk ON bk.r = pb.r AND bk.b = pb.b
       |         GROUP BY pb.q, pb.r),
       |est AS (SELECT q, MIN(cnt) AS est FROM cell GROUP BY q)
       |SELECT est.q AS word, CAST(COALESCE(wc.c, 0) AS BIGINT) AS n_exact,
       |  est.est AS est_merged, est.est AS est_direct
       |FROM est LEFT JOIN wc ON wc.w = est.q""".stripMargin
  }

  /** graph_pagerank twin: the 3 damped updates unrolled as CTEs (the
    * k-means Lloyd precedent) in the identical fixed-point arithmetic —
    * `//` here, `div` in the engine; both truncate, and every operand
    * is positive. Integer sums are order-free, so the hash gate holds
    * under any partitioning.
    */
  /** The full-corpus pagerank CTE chain (edges → degrees → 3 damped
    * updates) shared by the one-shot twin and the stored/incremental
    * twins — those gates' engine paths all resolve to the same row
    * set, so they share the oracle body too.
    */
  private def graphPageRankCtes(csWhere: String = ""): String = {
    val S = graft.operators.PageRank.Scale
    val iters = (1 to 3).map { i =>
      s"""c$i AS (SELECT e.dst AS node,
         |    CAST(SUM(r${i - 1}.r // o.out_deg) AS BIGINT) AS contrib
         |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node
         |         JOIN outdeg o ON e.src = o.src
         |  GROUP BY e.dst),
         |r$i AS (SELECT nodes.node,
         |    ((15 * $S // 100) // nn.n)
         |      + (85 * COALESCE(c$i.contrib, 0)) // 100 AS r
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN c$i ON nodes.node = c$i.node)""".stripMargin
    }.mkString(",\n")
    s"""cs AS (SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey$csWhere),
       |e AS (SELECT a AS src, b AS dst FROM cs
       |      UNION ALL SELECT b AS src, a AS dst FROM cs),
       |outdeg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS (SELECT node, $S // n AS r FROM nodes CROSS JOIN nn),
       |$iters""".stripMargin
  }

  val graphPageRank: String =
    s"""WITH ${graphPageRankCtes()}
       |SELECT r3.node, o.out_deg, CAST(r3.r AS BIGINT) AS rank_fp
       |FROM r3 JOIN outdeg o ON r3.node = o.src""".stripMargin

  /** graph_pagerank_purge twin: the identical superstep unroll over
    * the graph RE-DERIVED from the filtered source — dropping
    * `o_custkey % 89 = 0` from the edge derivation removes every edge
    * touching a purged customer in both symmetric directions, and the
    * downstream nodes/outdeg/rank CTEs recompute from the survivors
    * (suppliers orphaned by the purge vanish with their edges), which
    * is exactly what the folded spine + rewritten edge artifact must
    * reproduce.
    */
  val graphPageRankPurge: String =
    s"""WITH ${graphPageRankCtes(" WHERE o_custkey % 89 <> 0")}
       |SELECT r3.node, o.out_deg, CAST(r3.r AS BIGINT) AS rank_fp
       |FROM r3 JOIN outdeg o ON r3.node = o.src""".stripMargin

  /** graph_pagerank_maintain twin: the drift decision replayed from
    * exact counts — n_base = yesterday's (`o_orderkey % 2 != 0`)
    * distinct symmetric edges, n_new = the full set minus them (what
    * the anti-join append admits), rebuilt = the `n_new·2 > n_base`
    * trigger — plus the rank aggregates over the full corpus (ranks
    * are branch-invariant: both branches hold the identical edge
    * row set).
    */
  val graphPageRankMaintain: String =
    s"""WITH ${graphPageRankCtes()},
       |csb AS (SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  WHERE o_orderkey % 2 != 0),
       |counts AS (SELECT
       |  2 * (SELECT COUNT(*) FROM csb) AS n_base,
       |  2 * ((SELECT COUNT(*) FROM cs) - (SELECT COUNT(*) FROM csb)) AS n_new),
       |agg AS (SELECT COUNT(*) AS n_nodes, CAST(SUM(r) AS BIGINT) AS rank_sum FROM r3)
       |SELECT n_base, n_new, n_new * 2 > n_base AS rebuilt, n_nodes, rank_sum
       |FROM counts CROSS JOIN agg""".stripMargin

  /** graph_pagerank_warmstart twin: yesterday's 3 rounds over the
    * `% 7 != 0` graph unrolled, then TWO warm rounds over the full
    * graph seeded by that vector (new nodes take the uniform 1/|V|
    * mass) — the identical fixed-point arithmetic per round, so the
    * stored-ranks → fold → warm-iterate chain is replayed verbatim.
    */
  /** One damped PageRank round as DuckDB CTEs, parameterized over the
    * edge/degree/node-spine CTE names — shared by every two-phase
    * (cold-rounds-then-warm-rounds) oracle.
    */
  private def prRounds(pfx: String, e: String, o: String, nodes: String,
                       nn: String, r0: String, n: Int): String = {
    val S = graft.operators.PageRank.Scale
    (1 to n).map { i =>
      val prev = if (i == 1) r0 else s"$pfx${i - 1}"
      s"""c$pfx$i AS (SELECT $e.dst AS node,
         |    CAST(SUM($prev.r // o2.out_deg) AS BIGINT) AS contrib
         |  FROM $e JOIN $prev ON $e.src = $prev.node
         |         JOIN $o o2 ON $e.src = o2.src
         |  GROUP BY $e.dst),
         |$pfx$i AS (SELECT $nodes.node,
         |    ((15 * $S // 100) // $nn.n)
         |      + (85 * COALESCE(c$pfx$i.contrib, 0)) // 100 AS r
         |  FROM $nodes CROSS JOIN $nn
         |  LEFT JOIN c$pfx$i ON $nodes.node = c$pfx$i.node)""".stripMargin
    }.mkString(",\n")
  }

  val graphPageRankWarmstart: String = {
    val S = graft.operators.PageRank.Scale
    def rounds(pfx: String, e: String, o: String, nodes: String,
               nn: String, r0: String, n: Int) = prRounds(pfx, e, o, nodes, nn, r0, n)
    s"""WITH csy AS (SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  WHERE o_orderkey % 7 != 0),
       |ey AS (SELECT a AS src, b AS dst FROM csy
       |       UNION ALL SELECT b AS src, a AS dst FROM csy),
       |outy AS (SELECT src, COUNT(*) AS out_deg FROM ey GROUP BY src),
       |nodesy AS (SELECT DISTINCT src AS node FROM ey),
       |nny AS (SELECT COUNT(*) AS n FROM nodesy),
       |ry0 AS (SELECT node, $S // n AS r FROM nodesy CROSS JOIN nny),
       |${rounds("ry", "ey", "outy", "nodesy", "nny", "ry0", 3)},
       |cs AS (SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e AS (SELECT a AS src, b AS dst FROM cs
       |      UNION ALL SELECT b AS src, a AS dst FROM cs),
       |outdeg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |rw0 AS (SELECT nodes.node, COALESCE(ry3.r, $S // nn.n) AS r
       |  FROM nodes CROSS JOIN nn LEFT JOIN ry3 ON nodes.node = ry3.node),
       |${rounds("rw", "e", "outdeg", "nodes", "nn", "rw0", 2)}
       |SELECT rw2.node, o.out_deg, CAST(rw2.r AS BIGINT) AS rank_fp
       |FROM rw2 JOIN outdeg o ON rw2.node = o.src""".stripMargin
  }

  /** graph_pagerank_purge_warmstart twin: 3 cold rounds over the FULL
    * graph (yesterday's stored ranks), then 2 warm rounds over the
    * PURGED graph (`o_custkey % 89 <> 0`) seeded by those ranks —
    * surviving nodes carry their pre-purge rank into the first warm
    * round (every survivor existed yesterday, so the uniform fallback
    * never fires), and the purged graph's own spine drives the warm
    * arithmetic.
    */
  val graphPageRankPurgeWarmstart: String = {
    val S = graft.operators.PageRank.Scale
    s"""WITH csy AS (SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |ey AS (SELECT a AS src, b AS dst FROM csy
       |       UNION ALL SELECT b AS src, a AS dst FROM csy),
       |outy AS (SELECT src, COUNT(*) AS out_deg FROM ey GROUP BY src),
       |nodesy AS (SELECT DISTINCT src AS node FROM ey),
       |nny AS (SELECT COUNT(*) AS n FROM nodesy),
       |ry0 AS (SELECT node, $S // n AS r FROM nodesy CROSS JOIN nny),
       |${prRounds("ry", "ey", "outy", "nodesy", "nny", "ry0", 3)},
       |cs AS (SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  WHERE o_custkey % 89 <> 0),
       |e AS (SELECT a AS src, b AS dst FROM cs
       |      UNION ALL SELECT b AS src, a AS dst FROM cs),
       |outdeg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |rw0 AS (SELECT nodes.node, COALESCE(ry3.r, $S // nn.n) AS r
       |  FROM nodes CROSS JOIN nn LEFT JOIN ry3 ON nodes.node = ry3.node),
       |${prRounds("rw", "e", "outdeg", "nodes", "nn", "rw0", 2)}
       |SELECT rw2.node, o.out_deg, CAST(rw2.r AS BIGINT) AS rank_fp
       |FROM rw2 JOIN outdeg o ON rw2.node = o.src""".stripMargin
  }

  /** qa_sketch_reagg twin: the per-source and global KMV estimates via
    * the same min-k + 63/(v_64/2^52) arithmetic as the engine
    * (qaProfileActivitiesKmv precedent). The oracle computes __merged
    * and __direct from the SAME global distinct set — they must be
    * equal by min-k associativity, which is exactly what the gate
    * proves about the engine's sketch-merge path.
    */
  val qaSketchReagg: String = {
    def horner(expr: String): String =
      s"""CAST(list_reduce([strpos('0123456789abcdef', substr($expr, i, 1)) - 1
         |                  for i in range(1, 14)], (a, d) -> a * 16 + d) AS DOUBLE)""".stripMargin
    s"""WITH h AS (SELECT DISTINCT source, substr(md5(text), 1, 13) AS p FROM documents),
       |r AS (SELECT source, p,
       |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY p) AS rn,
       |        COUNT(*) OVER (PARTITION BY source) AS n
       |      FROM h),
       |per_source AS (
       |  SELECT source AS scope,
       |    CASE WHEN MAX(n) < 64 THEN CAST(MAX(n) AS DOUBLE)
       |         ELSE 63.0 / (${horner("MAX(CASE WHEN rn = 64 THEN p END)")} / 4503599627370496.0)
       |    END AS n_distinct_est
       |  FROM r GROUP BY source),
       |g AS (SELECT DISTINCT p FROM h),
       |gr AS (SELECT p, ROW_NUMBER() OVER (ORDER BY p) AS rn, COUNT(*) OVER () AS n FROM g),
       |gkmv AS (
       |  SELECT CASE WHEN MAX(n) < 64 THEN CAST(MAX(n) AS DOUBLE)
       |              ELSE 63.0 / (${horner("MAX(CASE WHEN rn = 64 THEN p END)")} / 4503599627370496.0)
       |         END AS n_distinct_est
       |  FROM gr)
       |SELECT scope, n_distinct_est FROM per_source
       |UNION ALL SELECT '__merged' AS scope, n_distinct_est FROM gkmv
       |UNION ALL SELECT '__direct' AS scope, n_distinct_est FROM gkmv""".stripMargin
  }

  /** sim_ivfpq_topk twin: simIvfTopK's coarse lists/probes composed
    * with simPqTopK's codes + ADC scoring — both approximation layers
    * replayed. Candidates = probed (cid) matches; score = the PQ
    * asymmetric-distance cosine with the same fold orders.
    */
  val simIvfpqTopK: String =
    s"""WITH $vecsDouble,
       |cb AS (SELECT vec_id AS c, vec FROM v WHERE vec_id < 16),
       |sv AS (SELECT c, j, vec[j*8+1 : j*8+8] AS sub FROM cb CROSS JOIN range(0, 8) r(j)),
       |xs AS (SELECT vec_id, j, vec[j*8+1 : j*8+8] AS sub FROM v CROSS JOIN range(0, 8) r(j)),
       |codes AS (
       |  SELECT vec_id, j, code FROM (
       |    SELECT x.vec_id, x.j, s.c AS code,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id, x.j
       |        ORDER BY ${sqDist("x.sub", "s.sub")} ASC NULLS LAST, s.c ASC NULLS FIRST) AS rn
       |    FROM xs x JOIN sv s ON s.j = x.j) WHERE rn = 1),
       |cc AS (SELECT vec_id AS cid, vec AS cvec FROM v WHERE vec_id < 8),
       |lists AS (
       |  SELECT vec_id AS neighbor_id, cid FROM (
       |    SELECT x.vec_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${cosine("x.vec", "c.cvec")} DESC NULLS LAST, c.cid ASC NULLS FIRST) AS rn
       |    FROM v x CROSS JOIN cc c)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, cid FROM (
       |    SELECT q.vec_id AS query_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosine("q.vec", "c.cvec")} DESC NULLS LAST, c.cid ASC NULLS FIRST) AS rn
       |    FROM v q CROSS JOIN cc c WHERE q.vec_id % 25 = 0)
       |  WHERE rn <= 2),
       |qn AS (
       |  SELECT vec_id AS query_id, vec AS q_vec,
       |    sqrt(list_reduce(list_transform(vec, x -> x * x), (a, x) -> a + x)) AS q_norm
       |  FROM v WHERE vec_id % 25 = 0),
       |cand AS (
       |  SELECT p.query_id, l.neighbor_id
       |  FROM probes p JOIN lists l USING (cid)
       |  WHERE p.query_id <> l.neighbor_id),
       |parts AS (
       |  SELECT cand.query_id, cand.neighbor_id, k.j, qn.q_norm,
       |    list_reduce([qn.q_vec[k.j*8 + i] * s.sub[i] for i in range(1, 9)],
       |                (a, x) -> a + x) AS dot_j,
       |    list_reduce(list_transform(s.sub, x -> x * x), (a, x) -> a + x) AS n2_j
       |  FROM cand
       |  JOIN codes k ON k.vec_id = cand.neighbor_id
       |  JOIN sv s ON s.j = k.j AND s.c = k.code
       |  JOIN qn ON qn.query_id = cand.query_id),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    list_reduce(list(dot_j ORDER BY j), (a, x) -> a + x)
       |      / (MIN(q_norm) * sqrt(list_reduce(list(n2_j ORDER BY j), (a, x) -> a + x))) AS score
       |  FROM parts GROUP BY query_id, neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(score, 6) AS score
       |FROM r WHERE rank <= 5""".stripMargin

  val simAnnRecall: String = {
    def recallOf(method: String, approxSql: String): String =
      s"""SELECT '$method' AS method, query_id, n_hits,
         |  CAST(n_hits AS DOUBLE) / 5.0 AS recall_at_5
         |FROM (
         |  SELECT e.query_id,
         |    CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
         |  FROM ($simCosineTopK) e
         |  LEFT JOIN ($approxSql) a
         |    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |  GROUP BY e.query_id)""".stripMargin
    s"""${recallOf("lsh", simAnnLshTopK)}
       |UNION ALL
       |${recallOf("ivf", simIvfTopK)}
       |UNION ALL
       |${recallOf("pq", simPqTopK)}
       |UNION ALL
       |${recallOf("ivfpq", simIvfpqTopK)}
       |UNION ALL
       |${recallOf("matryoshka", simMatryoshkaTopK)}
       |UNION ALL
       |${recallOf("int8", simQuantizedTopK)}
       |UNION ALL
       |${recallOf("ivf_append", simIvfAppendTopK)}""".stripMargin
  }

  /** One min-label propagation round over the symmetric+self-loop edge
    * list `sym` — the unrolled twin of ConnectedComponents.labelPropagate
    * (self-loops carry each vertex's own label, so a round is exactly
    * one join + MIN group).
    */
  private def ccIter(i: Int): String =
    s"""l$i AS (
       |  SELECT s.src AS id, MIN(l.component) AS component
       |  FROM sym s JOIN l${i - 1} l ON l.id = s.dst
       |  GROUP BY s.src)""".stripMargin

  /** dedup_clusters twin: 32/16 word chunking, shared-8-gram edges with
    * the 2..500 bucket cap, 7 unrolled propagation rounds (≥ the chunk
    * graph diameter: ≤ 100-word docs → ≤ 7 chunks/doc path).
    */
  val dedupClusters: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |ch AS (SELECT doc_id, unnest(range(0, ((len(words) - 1) // 16) + 1)) AS chunk_idx, words
       |       FROM w),
       |c2 AS (SELECT doc_id, chunk_idx, doc_id * 10000 + chunk_idx AS id,
       |              words[chunk_idx * 16 + 1 : chunk_idx * 16 + 32] AS cw
       |       FROM ch),
       |sh AS (SELECT DISTINCT id, sh FROM (
       |  SELECT id, unnest([array_to_string(cw[i:i+7], ' ') for i in range(1, len(cw) - 6)]) AS sh
       |  FROM c2 WHERE len(cw) >= 8)),
       |-- same bounded-bucket candidate generation as operators.Buckets
       |bc AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) BETWEEN 2 AND 500),
       |e AS (SELECT DISTINCT a.id AS src, b.id AS dst
       |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
       |      JOIN bc ON a.sh = bc.sh),
       |sym AS (SELECT src, dst FROM e
       |        UNION SELECT dst AS src, src AS dst FROM e
       |        UNION SELECT id AS src, id AS dst FROM c2),
       |l0 AS (SELECT id, id AS component FROM c2),
       |${(1 to 7).map(ccIter).mkString(",\n")}
       |SELECT c2.doc_id, c2.chunk_idx, l7.component
       |FROM c2 JOIN l7 ON l7.id = c2.id""".stripMargin

  /** dedup_semantic twin (SemDeDup): 3 unrolled Lloyd iterations over
    * the perturbed corpus (same fixture as dedupEmbeddingCosine), final
    * assignment under the trained c3 centroids, (cid, band)-bucketed
    * candidates with the 2..500 cap, cosine ≥ 0.95 ⇒ the higher id is a
    * duplicate (keep = lowest-id-per-group).
    */
  /** dedup_ngram_verified twin: LSH-banded candidate pairs (bounded
    * buckets, same cap), then EXACT shingle Jaccard per candidate via
    * list_intersect — the scale-safe composition the posting-list
    * detector's oracle can't reach at high duplication density.
    */
  val dedupNgramVerified: String =
    s"""WITH $nearDupCorpus,
       |$minhashBandedCtes,
       |bc AS (SELECT band FROM banded GROUP BY band HAVING COUNT(*) BETWEEN 2 AND 500),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
       |  JOIN bc ON a.band = bc.band)
       |SELECT c.doc_id_1, c.doc_id_2,
       |  CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
       |    / (len(s1.shingles) + len(s2.shingles)
       |       - len(list_intersect(s1.shingles, s2.shingles))) AS jaccard
       |FROM cand c
       |JOIN sh s1 ON s1.doc_id = c.doc_id_1
       |JOIN sh s2 ON s2.doc_id = c.doc_id_2
       |WHERE CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
       |    / (len(s1.shingles) + len(s2.shingles)
       |       - len(list_intersect(s1.shingles, s2.shingles))) >= 0.5""".stripMargin

  /** pipeline_dedup_incremental twin: the incremental path must return
    * exactly the FULL-RECOMPUTE detector's pairs restricted to those
    * touching the batch (`doc_id % 7 = 0` split) — the whole point of
    * the gate is that incremental-against-stored-state loses nothing
    * and invents nothing relative to rerunning the detector.
    */
  val pipelineDedupIncremental: String =
    s"""WITH pairs AS ($dedupMinhashLsh)
       |SELECT * FROM pairs
       |WHERE doc_id_1 % 7 = 0 OR doc_id_2 % 7 = 0""".stripMargin

  /** graph_triangles twin: the algorithm-independent statement — a
    * triangle is x < y < z with all three pair-edges present (the
    * pair CTE already emits a < b, so the join chain enforces the
    * order for free); per-node participation plus the global count
    * under node = -1. The Spark side's degree orientation is an
    * implementation detail the spec never mentions.
    */
  /** graph_transitivity twin: 3·triangles / wedges in exact-integer
    * ppm over the same pair CTE; wedges = Σ deg·(deg−1) // 2.
    */
  val graphTransitivity: String =
    s"""WITH pairs AS ($dedupMinhashLsh),
       |e AS (SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs),
       |tri AS (
       |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM e e1
       |  JOIN e e2 ON e2.a = e1.b
       |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       |deg AS (
       |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
       |    SELECT a AS node FROM e UNION ALL SELECT b FROM e) u
       |  GROUP BY node),
       |agg AS (
       |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_tri,
       |    CAST(SUM(deg * (deg - 1)) AS BIGINT) // 2 AS n_wedges
       |  FROM deg)
       |SELECT n_tri, n_wedges,
       |  CASE WHEN n_wedges = 0 THEN CAST(0 AS BIGINT)
       |       ELSE (3 * n_tri * 1000000) // n_wedges END AS transitivity_ppm
       |FROM agg""".stripMargin

  val graphTriangles: String =
    s"""WITH pairs AS ($dedupMinhashLsh),
       |e AS (SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs),
       |tri AS (
       |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM e e1
       |  JOIN e e2 ON e2.a = e1.b
       |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       |per_node AS (
       |  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
       |    SELECT x AS node FROM tri
       |    UNION ALL SELECT y FROM tri
       |    UNION ALL SELECT z FROM tri) u
       |  GROUP BY node)
       |SELECT CAST(-1 AS BIGINT) AS node,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_tri
       |UNION ALL
       |SELECT node, n_tri FROM per_node""".stripMargin

  /** pipeline_dedup_embedding_incremental twin: the one-shot embedding
    * detector over corpus ∪ batch, restricted to batch-touching pairs
    * (batch = vec_id % 7 < 2 — see the Spark query's split rationale).
    */
  lazy val pipelineDedupEmbeddingIncremental: String =
    s"""WITH pairs AS ($dedupEmbeddingCosine)
       |SELECT * FROM pairs
       |WHERE id_1 % 7 < 2 OR id_2 % 7 < 2""".stripMargin

  /** streaming_dedup_bands twin: new-vs-corpus banded pairs with the
    * bucket cap on the CORPUS band size (the arrival-order-independent
    * streaming contract — a verdict for doc N cannot depend on docs
    * arriving after it).
    */
  val streamingDedupBands: String =
    s"""WITH $nearDupCorpus,
       |$minhashBandedCtes,
       |corpus AS (SELECT * FROM banded WHERE doc_id % 7 <> 0),
       |batch AS (SELECT * FROM banded WHERE doc_id % 7 = 0),
       |bc AS (SELECT band FROM corpus GROUP BY band HAVING COUNT(*) BETWEEN 1 AND 500)
       |SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_id_1,
       |  greatest(a.doc_id, b.doc_id) AS doc_id_2,
       |  CAST(len(list_filter(range(1, 17), i -> a.sigs[i] = b.sigs[i])) AS DOUBLE) / 16 AS est_jaccard
       |FROM batch a JOIN corpus b USING (band) JOIN bc USING (band)
       |WHERE CAST(len(list_filter(range(1, 17), i -> a.sigs[i] = b.sigs[i])) AS DOUBLE) / 16 >= 0.4""".stripMargin

  /** streaming_dedup_bands_stateful twin: ALL within-batch co-banded
    * pairs (bounded-bucket cap — valid because the fixture's band
    * sizes stay far below the cap, spec-asserted; past the cap the
    * streaming first-arrivals-win semantics would diverge and the
    * gate would catch it).
    */
  val streamingDedupBandsStateful: String =
    s"""WITH $nearDupCorpus,
       |$minhashBandedCtes,
       |batch AS (SELECT * FROM banded WHERE doc_id % 5 = 0),
       |bc AS (SELECT band FROM batch GROUP BY band HAVING COUNT(*) BETWEEN 2 AND 500)
       |SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_id_1,
       |  greatest(a.doc_id, b.doc_id) AS doc_id_2,
       |  CAST(len(list_filter(range(1, 17), i -> a.sigs[i] = b.sigs[i])) AS DOUBLE) / 16 AS est_jaccard
       |FROM batch a JOIN batch b ON a.band = b.band AND a.doc_id < b.doc_id
       |JOIN bc ON a.band = bc.band
       |WHERE CAST(len(list_filter(range(1, 17), i -> a.sigs[i] = b.sigs[i])) AS DOUBLE) / 16 >= 0.4""".stripMargin

  /** Per-word applied-BPE token list: the SAME leading-separator
    * replace-chain encoding as TextFunctions.bpeEncodeWord, with the
    * chain BUILT FROM the same BpeMerges table — one definition, no
    * literal drift between engines. `$w` is a SQL expression for the
    * word (typically a lambda variable).
    */
  private def bpeWordTokensSql(w: String): String = {
    val spaced = s"' ' || array_to_string(string_split($w, ''), ' ')"
    val chain = graft.functions.TextFunctions.BpeMerges.foldLeft(spaced) {
      case (s, (a, b)) => s"replace($s, ' $a $b', ' $a$b')"
    }
    s"string_split(trim($chain), ' ')"
  }

  /** text_bpe_encode twin: ten unrolled merge applications per word,
    * flattened in word order; the stream md5 gates the exact token
    * sequences.
    */
  val textBpeEncode: String =
    s"""WITH w AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
       |  FROM documents),
       |enc AS (
       |  SELECT doc_id,
       |    flatten(list_transform(words, w -> ${bpeWordTokensSql("w")})) AS toks,
       |    CASE WHEN len(words) = 0 THEN 0
       |         ELSE list_reduce(list_transform(words, w -> CAST(len(w) AS BIGINT)),
       |                          (a, b) -> a + b) END AS n_chars
       |  FROM w)
       |SELECT doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  n_chars,
       |  md5(array_to_string(toks, ' ')) AS stream_md5
       |FROM enc""".stripMargin

  /** pack_sequences_bpe twin: the pack_sequences shape with n_tokens =
    * the applied-BPE stream length.
    */
  val packSequencesBpe: String =
    s"""SELECT doc_id, pack_group,
       |  CAST(floor(cum_before / 512) AS BIGINT) AS pack_bin, n_tokens
       |FROM (
       |  SELECT doc_id, pack_group, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY pack_group
       |      ORDER BY digest ASC NULLS FIRST, doc_id ASC NULLS FIRST
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM (
       |    SELECT doc_id,
       |      CAST(len(flatten(list_transform(
       |        list_filter(string_split(text, ' '), x -> x <> ''),
       |        w -> ${bpeWordTokensSql("w")}))) AS BIGINT) AS n_tokens,
       |      md5(text) AS digest,
       |      CAST(('0x' || substr(md5(text), 1, 1))::UBIGINT AS BIGINT) AS pack_group
       |    FROM documents))""".stripMargin

  /** pipeline_dedup_exact_incremental twin: first-seen-wins exact dedup
    * of the batch split against the corpus split — corpus minimum stays
    * canonical wherever its digest exists; a digest seen only in the
    * batch falls to the batch minimum.
    */
  val pipelineDedupExactIncremental: String =
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
      |tagged AS (
      |  SELECT doc_id, md5(text) AS digest, (doc_id % 7 = 0) AS is_new FROM all_docs),
      |keeper AS (
      |  SELECT digest,
      |    MIN(CASE WHEN NOT is_new THEN doc_id END) AS corpus_canonical,
      |    MIN(CASE WHEN is_new THEN doc_id END) AS batch_min
      |  FROM tagged GROUP BY digest)
      |SELECT t.doc_id,
      |  COALESCE(k.corpus_canonical, k.batch_min) AS canonical_id,
      |  (t.doc_id = COALESCE(k.corpus_canonical, k.batch_min)) AS keep,
      |  CASE WHEN t.doc_id = COALESCE(k.corpus_canonical, k.batch_min) THEN 'canonical'
      |       WHEN k.corpus_canonical IS NOT NULL THEN 'dup_corpus'
      |       ELSE 'dup_batch' END AS status
      |FROM tagged t JOIN keeper k USING (digest)
      |WHERE t.is_new""".stripMargin

  /** pipeline_state_publish twin: the two-day digest-state fold's END
    * STATE — corpus minimum stays canonical wherever its digest exists
    * (first-seen wins through the v1→v2 fold), batch-only digests take
    * the batch minimum. The Spark side routes both days through
    * write-audit-publish storage; equality proves the round trips
    * changed nothing.
    */
  val pipelineStatePublish: String =
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
      |tagged AS (
      |  SELECT doc_id, md5(text) AS digest, (doc_id % 7 = 0) AS is_new FROM all_docs)
      |SELECT digest,
      |  COALESCE(MIN(CASE WHEN NOT is_new THEN doc_id END),
      |           MIN(CASE WHEN is_new THEN doc_id END)) AS canonical_id
      |FROM tagged GROUP BY digest""".stripMargin

  /** The end-to-end corpus-build CTE chain shared by the
    * pipeline_build_corpus shard-stats and audit twins: planted-dup
    * corpus with text → Gopher quality → minhash-LSH pairs → 4-round
    * components → min-surviving-member canonical keep → eval holdout +
    * fuzzy decontamination → BPE-count packing → dense global ids in
    * (pack_group, pack_bin) order. Every stage is the already-gated
    * operator's oracle form, chained.
    */
  private val buildCorpusCtes: String = {
    val mtl = """(CAST(length(text) AS DOUBLE) - CAST(len(string_split(text, ' ')) - 1 AS DOUBLE))
                |          / CAST(len(string_split(text, ' ')) AS DOUBLE)""".stripMargin
    s"""aug AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    COALESCE(array_to_string(ws[6:len(ws)], ' '), '') AS text
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
       |  WHERE doc_id % 10 = 0),
       |q AS (
       |  SELECT doc_id FROM aug
       |  WHERE len(string_split(text, ' ')) >= 10
       |    AND len(string_split(text, ' ')) <= 100000
       |    AND $mtl >= 2.0
       |    AND $mtl <= 12.0
       |    AND CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
       |          / CAST(length(text) AS DOUBLE) >= 0.5
       |    AND len(list_filter(string_split(text, ' '),
       |          w -> w IN ('the','data','order','key','value'))) >= 1),
       |pairs AS ($dedupMinhashLsh),
       |$nearDupCorpus,
       |sym AS (SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
       |        UNION SELECT doc_id_2 AS src, doc_id_1 AS dst FROM pairs
       |        UNION SELECT doc_id AS src, doc_id AS dst FROM nd),
       |l0 AS (SELECT doc_id AS id, doc_id AS component FROM nd),
       |${(1 to 4).map(ccIter).mkString(",\n")},
       |s2 AS (
       |  SELECT id AS doc_id FROM (
       |    SELECT l4.id, MIN(l4.id) OVER (PARTITION BY l4.component) AS m
       |    FROM l4 JOIN q ON l4.id = q.doc_id)
       |  WHERE id = m),
       |cont AS (SELECT doc_id FROM ($textDecontaminateFuzzy) WHERE contaminated),
       |s3 AS (
       |  SELECT doc_id FROM s2
       |  WHERE NOT (doc_id % 50 = 0 AND doc_id < 1000000)
       |    AND doc_id NOT IN (SELECT doc_id FROM cont)),
       |enc AS (
       |  SELECT a.doc_id,
       |    CAST(len(flatten(list_transform(
       |      list_filter(string_split(a.text, ' '), x -> x <> ''),
       |      w -> ${bpeWordTokensSql("w")}))) AS BIGINT) AS n_tokens,
       |    md5(a.text) AS digest,
       |    CAST(('0x' || substr(md5(a.text), 1, 1))::UBIGINT AS BIGINT) AS pack_group
       |  FROM aug a JOIN s3 USING (doc_id)),
       |packed AS (
       |  SELECT doc_id, pack_group, n_tokens, digest,
       |    CAST(floor(COALESCE(SUM(n_tokens) OVER (PARTITION BY pack_group
       |      ORDER BY digest ASC NULLS FIRST, doc_id ASC NULLS FIRST
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS BIGINT)
       |      AS pack_bin
       |  FROM enc),
       |offs AS (
       |  SELECT pack_group, pack_bin,
       |    COALESCE(SUM(cnt) OVER (ORDER BY pack_group ASC NULLS FIRST,
       |      pack_bin ASC NULLS FIRST
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM (SELECT pack_group, pack_bin, COUNT(*) AS cnt
       |        FROM packed GROUP BY 1, 2)),
       |ids AS (
       |  SELECT p.doc_id, p.pack_group, p.pack_bin, p.n_tokens, p.digest,
       |    CAST(o.off + ROW_NUMBER() OVER (PARTITION BY p.pack_group, p.pack_bin
       |      ORDER BY p.digest ASC NULLS FIRST, p.doc_id ASC NULLS FIRST) - 1
       |      AS BIGINT) AS global_id
       |  FROM packed p JOIN offs o USING (pack_group, pack_bin))""".stripMargin
  }

  /** pipeline_build_corpus twin: the chain's published shards
    * re-aggregated per pack_group — the engine computes this off the
    * READ-BACK rows, so equality proves chain + round trip together.
    */
  val pipelineBuildCorpus: String =
    s"""WITH $buildCorpusCtes
       |SELECT pack_group,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT pack_bin) AS BIGINT) AS n_bins,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
       |  MIN(global_id) AS min_global_id,
       |  MAX(global_id) AS max_global_id,
       |  CAST(SUM(CAST(('0x' || substr(digest, 1, 8))::UBIGINT AS BIGINT)) AS BIGINT)
       |    AS content_sum
       |FROM ids GROUP BY pack_group""".stripMargin

  /** pipeline_build_corpus_audit twin: the per-stage funnel counts;
    * the publish stage states rows_out = rows_in — the losslessness
    * claim the engine checks against the read-back row count.
    */
  val pipelineBuildCorpusAudit: String =
    s"""WITH $buildCorpusCtes,
       |c AS (SELECT
       |  (SELECT COUNT(*) FROM aug) AS n0,
       |  (SELECT COUNT(*) FROM q) AS n1,
       |  (SELECT COUNT(*) FROM s2) AS n2,
       |  (SELECT COUNT(*) FROM s3) AS n3,
       |  (SELECT COUNT(*) FROM ids) AS n4)
       |SELECT CAST(1 AS BIGINT) AS stage_no, 'quality' AS stage,
       |  n0 AS rows_in, n1 AS rows_out, n0 - n1 AS rows_dropped FROM c
       |UNION ALL SELECT 2, 'dedup_canonical', n1, n2, n1 - n2 FROM c
       |UNION ALL SELECT 3, 'decontaminate_fuzzy', n2, n3, n2 - n3 FROM c
       |UNION ALL SELECT 4, 'pack_ids_bpe', n3, n4, n3 - n4 FROM c
       |UNION ALL SELECT 5, 'publish', n4, n4, 0 FROM c""".stripMargin

  /** pipeline_dedup_canonical twin: the minhash query nested as a CTE,
    * symmetric+self-loop edges over the full dup corpus, 4 unrolled
    * propagation rounds, keep = (id = component).
    */
  val pipelineDedupCanonical: String =
    s"""WITH pairs AS ($dedupMinhashLsh),
       |$nearDupCorpus,
       |sym AS (SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
       |        UNION SELECT doc_id_2 AS src, doc_id_1 AS dst FROM pairs
       |        UNION SELECT doc_id AS src, doc_id AS dst FROM nd),
       |l0 AS (SELECT doc_id AS id, doc_id AS component FROM nd),
       |${(1 to 4).map(ccIter).mkString(",\n")}
       |SELECT id AS doc_id, component, (id = component) AS keep FROM l4""".stripMargin

  /** pipeline_split_leakage_safe twin: the canonical-dedup cluster CTEs
    * plus the md5-bucket split of the component id (and of the doc id,
    * to expose which docs the cluster rule moved).
    */
  val pipelineSplitLeakageSafe: String = {
    def splitOf(c: String): String =
      s"""CASE WHEN CAST(('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 4))::UBIGINT AS BIGINT) % 10 < 8 THEN 'train'
         |     WHEN CAST(('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 4))::UBIGINT AS BIGINT) % 10 = 8 THEN 'val'
         |     ELSE 'test' END""".stripMargin
    s"""WITH pairs AS ($dedupMinhashLsh),
       |$nearDupCorpus,
       |sym AS (SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
       |        UNION SELECT doc_id_2 AS src, doc_id_1 AS dst FROM pairs
       |        UNION SELECT doc_id AS src, doc_id AS dst FROM nd),
       |l0 AS (SELECT doc_id AS id, doc_id AS component FROM nd),
       |${(1 to 4).map(ccIter).mkString(",\n")}
       |SELECT id AS doc_id, component,
       |  ${splitOf("component")} AS split,
       |  (${splitOf("id")}) <> (${splitOf("component")}) AS moved_by_cluster_rule
       |FROM l4""".stripMargin
  }

  /** pipeline_dedup_weights twin: the canonical-dedup cluster CTEs plus
    * a component-size count and the ppm fixed-point weight.
    */
  val pipelineDedupWeights: String =
    s"""WITH pairs AS ($dedupMinhashLsh),
       |$nearDupCorpus,
       |sym AS (SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
       |        UNION SELECT doc_id_2 AS src, doc_id_1 AS dst FROM pairs
       |        UNION SELECT doc_id AS src, doc_id AS dst FROM nd),
       |l0 AS (SELECT doc_id AS id, doc_id AS component FROM nd),
       |${(1 to 4).map(ccIter).mkString(",\n")},
       |sz AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |       FROM l4 GROUP BY component)
       |SELECT l4.id AS doc_id, l4.component, sz.cluster_size,
       |  1000000 // sz.cluster_size AS weight_ppm
       |FROM l4 JOIN sz ON l4.component = sz.component""".stripMargin

  // ===== round 8: delete propagation into stored state artifacts =====

  /** The exact-dup corpus and its purged complement, shared by the
    * digest-state purge twins.
    */
  private val exactDupDocsCtes =
    """all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
      |surv AS (SELECT * FROM all_docs WHERE doc_id % 89 <> 0)""".stripMargin

  /** pipeline_purge_digest_state twin: the digest state recomputed FROM
    * SCRATCH over the purged corpus — the Spark side must land on this
    * via stored-state re-election (v1 read-back, affected-only
    * re-elect, v2 publish), so a hash match proves the incremental
    * purge equals a full rebuild.
    */
  val pipelinePurgeDigestState: String =
    s"""WITH $exactDupDocsCtes
       |SELECT md5(text) AS digest, MIN(doc_id) AS canonical_id
       |FROM surv GROUP BY digest""".stripMargin

  /** The one-shot minhash detector over the PURGED near-dup corpus —
    * the full-recompute ground every stored-band-purge twin compares
    * against (same shape as [[dedupMinhashLsh]], purged `nd`).
    */
  private val dedupMinhashLshPurged: String =
    s"""WITH $nearDupCorpusPurged,
       |$minhashBandedCtes,
       |bc AS (SELECT band FROM banded GROUP BY band HAVING COUNT(*) BETWEEN 2 AND 500)
       |SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       |  CAST(len(list_filter(range(1, 17), i -> a.sigs[i] = b.sigs[i])) AS DOUBLE) / 16 AS est_jaccard
       |FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
       |JOIN bc ON a.band = bc.band
       |WHERE CAST(len(list_filter(range(1, 17), i -> a.sigs[i] = b.sigs[i])) AS DOUBLE) / 16 >= 0.4""".stripMargin

  /** pipeline_purge_band_pairs twin: the full-recompute detector over
    * (corpus \ roster) ∪ batch — corpus = `% 7 <> 0`, roster = corpus
    * ids at `% 89 = 0` — restricted to batch-touching pairs. The Spark
    * side reaches this through the PURGED stored band state, so the
    * match proves member-filter + recomputed counts behave exactly
    * like a state rebuilt from the purged corpus.
    */
  val pipelinePurgeBandPairs: String =
    s"""WITH base_nd AS (
       |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    (string_split(text, ' '))[6:len(string_split(text, ' '))] AS words
       |  FROM documents WHERE doc_id % 10 = 0),
       |nd AS (SELECT * FROM base_nd WHERE NOT (doc_id % 7 <> 0 AND doc_id % 89 = 0)),
       |$minhashBandedCtes,
       |bc AS (SELECT band FROM banded GROUP BY band HAVING COUNT(*) BETWEEN 2 AND 500)
       |SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       |  CAST(len(list_filter(range(1, 17), i -> a.sigs[i] = b.sigs[i])) AS DOUBLE) / 16 AS est_jaccard
       |FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
       |JOIN bc ON a.band = bc.band
       |WHERE CAST(len(list_filter(range(1, 17), i -> a.sigs[i] = b.sigs[i])) AS DOUBLE) / 16 >= 0.4
       |  AND (a.doc_id % 7 = 0 OR b.doc_id % 7 = 0)""".stripMargin

  /** pipeline_purge_clusters twin: the FULL re-cluster over the purged
    * corpus (purged detector pairs, symmetric+self-loop edges, min-label
    * propagation). 6 rounds, not the unpurged query's 4: deleting a
    * bridge doc can lengthen surviving paths (a cycle member's removal
    * up to doubles a component's diameter), and extra rounds past
    * convergence change nothing. The Spark side reaches this via
    * component-local decremental re-solve — untouched components
    * verbatim, affected ones re-solved over survivors — so the match
    * proves splits and re-elected minima land exactly where a rebuild
    * puts them.
    */
  /** pipeline_split_by_cluster twin: the unpurged LSH pairs → 6
    * unrolled propagation rounds → per-component multiplicative-hash
    * split (Knuth 2654435761 mod 2^32, buckets 0-7 train / 8 val /
    * 9 test) → per-split rollup. Leak-freedom is require()d on the
    * Spark side; here it holds by construction (one split per
    * component).
    */
  val pipelineSplitByCluster: String =
    s"""WITH pairs AS ($dedupMinhashLsh),
       |$nearDupCorpus,
       |sym AS (SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
       |        UNION SELECT doc_id_2 AS src, doc_id_1 AS dst FROM pairs
       |        UNION SELECT doc_id AS src, doc_id AS dst FROM nd),
       |l0 AS (SELECT doc_id AS id, doc_id AS component FROM nd),
       |${(1 to 6).map(ccIter).mkString(",\n")},
       |asg AS (
       |  SELECT id AS doc_id, component,
       |    CASE WHEN (component * 2654435761) % 4294967296 % 10 < 8 THEN 'train'
       |         WHEN (component * 2654435761) % 4294967296 % 10 = 8 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM l6)
       |SELECT split, count(*) AS n_docs,
       |  count(DISTINCT component) AS n_clusters,
       |  CAST(sum(doc_id) AS BIGINT) AS sum_ids
       |FROM asg GROUP BY split""".stripMargin

  val pipelinePurgeClusters: String =
    s"""WITH pairs AS ($dedupMinhashLshPurged),
       |$nearDupCorpusPurged,
       |sym AS (SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
       |        UNION SELECT doc_id_2 AS src, doc_id_1 AS dst FROM pairs
       |        UNION SELECT doc_id AS src, doc_id AS dst FROM nd),
       |l0 AS (SELECT doc_id AS id, doc_id AS component FROM nd),
       |${(1 to 6).map(ccIter).mkString(",\n")}
       |SELECT id AS doc_id, component, (id = component) AS keep FROM l6""".stripMargin

  /** sim_ivf_purge_topk twin: centroids trained on the FULL corpus
    * (the frozen pre-purge quantizer — purge does not retrain; the
    * drift metric owns that), assignment restricted to surviving
    * vectors, probes restricted to surviving queries. Identical to a
    * rebuild-under-frozen-centroids over the purged corpus, which is
    * what the physically rewritten stored lists must equal.
    */
  val simIvfPurgeTopK: String =
    s"""WITH $vecsDouble,
       |c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC NULLS FIRST) - 1 AS INTEGER) AS cid,
       |         vec AS centroid
       |  FROM (SELECT vec_id, vec FROM v ORDER BY vec_id ASC NULLS FIRST LIMIT 8)),
       |${(1 to 3).map(kmeansIter(_)).mkString(",\n")},
       |lists AS (
       |  SELECT id AS neighbor_id, vec AS c_vec, cid FROM (
       |    SELECT x.vec_id AS id, x.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${sqDist("x.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM v x CROSS JOIN c3 c WHERE x.vec_id % 89 <> 0)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT id AS query_id, vec AS q_vec, cid FROM (
       |    SELECT q.vec_id AS id, q.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${sqDist("q.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM v q CROSS JOIN c3 c
       |    WHERE q.vec_id % 25 = 0 AND q.vec_id % 89 <> 0)
       |  WHERE rn <= 2),
       |scored AS (
       |  SELECT p.query_id, l.neighbor_id, ${cosine("p.q_vec", "l.c_vec")} AS score
       |  FROM lists l JOIN probes p USING (cid)
       |  WHERE p.query_id <> l.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(score, 6) AS score
       |FROM r WHERE rank <= 5""".stripMargin

  /** pipeline_delete_propagate_state twin: every audit count recomputed
    * from scratch over the purged corpus. `n_leaked` for digest_state
    * is a genuine re-derivation (the min over survivors can itself be
    * probed against the rule); for band_state and cluster_labels the
    * recompute's leak count is zero BY DEFINITION of "recomputed from
    * the purged corpus" (a banded row / label row of the purged corpus
    * cannot satisfy the purge rule), so the oracle states 0 and the
    * gate's force is entirely on the SPARK side, which measures the
    * count from the published v2 parquet on disk — a purge bug shows
    * up there. `n_stale_versions` is a filesystem probe (live
    * non-current version dirs after history retirement) DuckDB cannot
    * see; the oracle pins the required value 0.
    *
    * Band counts exploit that banding is PER-DOC (signatures don't
    * depend on the rest of the corpus): the purged corpus's banded
    * rows are exactly the full corpus's banded rows minus the
    * roster's, so one banded CTE serves both sides of every count.
    * This also makes `n_refs_purged` an implicit saturation canary: it
    * equals Spark's measured member-entry delta only while no band
    * stores a truncated member list.
    */
  val pipelineDeletePropagateState: String =
    s"""WITH $exactDupDocsCtes,
       |base_nd AS (
       |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    (string_split(text, ' '))[6:len(string_split(text, ' '))] AS words
       |  FROM documents WHERE doc_id % 10 = 0),
       |nd AS (SELECT * FROM base_nd),
       |$minhashBandedCtes
       |SELECT 'digest_state' AS artifact,
       |  (SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) FROM all_docs) AS n_before,
       |  (SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) FROM surv) AS n_after,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM (
       |     SELECT MIN(doc_id) AS c FROM all_docs GROUP BY md5(text))
       |   WHERE c % 89 = 0) AS n_refs_purged,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM (
       |     SELECT MIN(doc_id) AS c FROM surv GROUP BY md5(text))
       |   WHERE c % 89 = 0) AS n_leaked,
       |  CAST(0 AS BIGINT) AS n_stale_versions
       |UNION ALL
       |SELECT 'band_state',
       |  (SELECT CAST(COUNT(DISTINCT band) AS BIGINT) FROM banded),
       |  (SELECT CAST(COUNT(DISTINCT band) AS BIGINT) FROM banded WHERE doc_id % 89 <> 0),
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM banded WHERE doc_id % 89 = 0),
       |  CAST(0 AS BIGINT),
       |  CAST(0 AS BIGINT)
       |UNION ALL
       |SELECT 'cluster_labels',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM nd),
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM nd WHERE doc_id % 89 <> 0),
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM nd WHERE doc_id % 89 = 0),
       |  CAST(0 AS BIGINT),
       |  CAST(0 AS BIGINT)""".stripMargin

  /** One unrolled BPE training round: count adjacent symbol pairs of
    * the round-(r-1) corpus, pick the argmax (count desc, a asc, b asc
    * — ties to the lexicographically smallest pair), and build the
    * round-r corpus by applying that DATA-DRIVEN merge (the pattern is
    * read from the argmax row via a cross join, not a literal — the
    * same way the k-means unroll reads c{i-1}).
    */
  private def bpeTrainRound(r: Int): String =
    s"""p$r AS (
       |  SELECT pr.a AS a, pr.b AS b, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM (
       |    SELECT unnest([{'a': t[i], 'b': t[i+1]} for i in range(1, len(t))]) AS pr
       |    FROM (SELECT string_split(trim(s), ' ') AS t FROM w${r - 1}))
       |  GROUP BY pr.a, pr.b),
       |m$r AS (SELECT a, b, n FROM p$r
       |        ORDER BY n DESC, a ASC NULLS FIRST, b ASC NULLS FIRST LIMIT 1),
       |w$r AS (SELECT replace(s, ' ' || m.a || ' ' || m.b, ' ' || m.a || m.b) AS s
       |        FROM w${r - 1} CROSS JOIN m$r m)""".stripMargin

  /** text_bpe_train twin: the full 10-round training loop unrolled —
    * each round's merge pattern comes from the previous rounds' argmax
    * rows, so the chain is data-driven end to end; iterative replace on
    * w{r-1} equals the Spark side's full-chain re-encode of the raw
    * word because sequential replaces compose.
    */
  val textBpeTrain: String =
    s"""WITH w0 AS (
       |  SELECT ' ' || array_to_string(string_split(w, ''), ' ') AS s
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) >= 2),
       |${(1 to 10).map(bpeTrainRound).mkString(",\n")}
       |${(1 to 10).map(r =>
           s"SELECT CAST($r AS BIGINT) AS rank, a, b, n FROM m$r")
         .mkString("\nUNION ALL\n")}""".stripMargin

  /** text_bpe_train_encode twin: the unrolled training CTEs (m1..m10)
    * feed the encode replace chain as COLUMN references — the merge
    * table is data-driven end to end, so the gate binds trainer AND
    * encoder at once. Each m$r is one row, so the ten cross joins are
    * scalar.
    */
  val textBpeTrainEncode: String = {
    val chain = (1 to 10).foldLeft(
      "' ' || array_to_string(string_split(w, ''), ' ')") { (acc, r) =>
      s"replace($acc, ' ' || m$r.a || ' ' || m$r.b, ' ' || m$r.a || m$r.b)"
    }
    s"""WITH w0 AS (
       |  SELECT ' ' || array_to_string(string_split(w, ''), ' ') AS s
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) >= 2),
       |${(1 to 10).map(bpeTrainRound).mkString(",\n")},
       |dw AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
       |  FROM documents),
       |enc AS (
       |  SELECT doc_id,
       |    flatten(list_transform(words,
       |      w -> string_split(trim($chain), ' '))) AS toks
       |  FROM dw${(1 to 10).map(r => s" CROSS JOIN m$r").mkString})
       |SELECT doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  md5(array_to_string(toks, ' ')) AS stream_md5
       |FROM enc""".stripMargin
  }

  /** text_bpe_merges twin: adjacent char pairs within words via
    * list-comprehension unnest; same (count desc, pair asc) total
    * order.
    */
  val textBpeMerges: String =
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |p AS (SELECT unnest([substr(w, i, 2) for i in range(1, len(w))]) AS pair
      |      FROM w WHERE len(w) >= 2)
      |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
      |FROM p GROUP BY pair
      |ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin

  /** Perturbed-duplicate corpus (ExtQueries.withPerturbedVecs's twin),
    * shared by the semantic-dedup and contrastive-mining oracles.
    */
  private val perturbedVecs: String =
    """vb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |       FROM embeddings),
      |v AS (
      |  SELECT vec_id, vec FROM vb
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id,
      |    [vec[i] + CAST((i % 5) - 2 AS DOUBLE) * 0.01 for i in range(1, len(vec) + 1)] AS vec
      |  FROM vb WHERE vec_id % 10 = 0)""".stripMargin

  /** mine_contrastive_pairs twin: per anchor the top near-dup (cos ≥
    * 0.95) and top non-dup, ROW_NUMBER with the same (cos desc, id asc)
    * total order the struct-max argmax encodes.
    */
  val mineContrastivePairs: String =
    s"""WITH $perturbedVecs,
       |a AS (SELECT vec_id AS anchor_id, vec AS a_vec FROM v WHERE vec_id % 25 = 0),
       |scored AS (
       |  SELECT a.anchor_id, c.vec_id AS cand_id, ${cosine("a.a_vec", "c.vec")} AS cos
       |  FROM v c JOIN a ON a.anchor_id <> c.vec_id),
       |pos AS (
       |  SELECT anchor_id, cand_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY anchor_id
       |      ORDER BY cos DESC NULLS LAST, cand_id ASC NULLS FIRST) AS rn
       |  FROM scored WHERE cos >= 0.95),
       |neg AS (
       |  SELECT anchor_id, cand_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY anchor_id
       |      ORDER BY cos DESC NULLS LAST, cand_id ASC NULLS FIRST) AS rn
       |  FROM scored WHERE cos < 0.95)
       |SELECT a.anchor_id,
       |  p.cand_id AS positive_id, round(p.cos, 6) AS pos_cos,
       |  n.cand_id AS negative_id, round(n.cos, 6) AS neg_cos
       |FROM a
       |LEFT JOIN (SELECT * FROM pos WHERE rn = 1) p USING (anchor_id)
       |LEFT JOIN (SELECT * FROM neg WHERE rn = 1) n USING (anchor_id)""".stripMargin

  val dedupSemantic: String =
    s"""WITH $perturbedVecs,
       |c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC NULLS FIRST) - 1 AS INTEGER) AS cid,
       |         vec AS centroid
       |  FROM (SELECT vec_id, vec FROM v ORDER BY vec_id ASC NULLS FIRST LIMIT 8)),
       |${(1 to 3).map(kmeansIter(_)).mkString(",\n")},
       |asg AS (
       |  SELECT id, vec, cid FROM (
       |    SELECT x.vec_id AS id, x.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${sqDist("x.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM v x CROSS JOIN c3 c)
       |  WHERE rn = 1),
       |sg AS (SELECT id, vec, cid, ${signature("vec", 16)} AS sig FROM asg),
       |blocks AS (
       |  SELECT id, vec, cid,
       |    unnest([CAST(cid AS VARCHAR) || '|' || CAST(b AS VARCHAR) || '|' || substr(sig, 1 + b * 4, 4)
       |            for b in range(0, 4)]) AS band
       |  FROM sg),
       |-- same bounded-bucket candidate generation as operators.Buckets
       |bc AS (SELECT band FROM blocks GROUP BY band HAVING COUNT(*) BETWEEN 2 AND 500),
       |dup AS (
       |  SELECT DISTINCT b2.id AS id
       |  FROM blocks a JOIN blocks b2 ON a.band = b2.band AND a.id < b2.id
       |  JOIN bc ON a.band = bc.band
       |  WHERE ${cosine("a.vec", "b2.vec")} >= 0.95)
       |SELECT asg.id AS vec_id, asg.cid, (dup.id IS NULL) AS keep
       |FROM asg LEFT JOIN dup ON dup.id = asg.id""".stripMargin

  /** Banded twin of Similarity.nearDupPairs (4 bands × 4 bits of a
    * 16-bit hyperplane signature, bucket count cap 2..500 mirroring
    * Buckets.boundedMembers, DISTINCT because a pair may collide in
    * several bands).
    */
  val dedupEmbeddingCosine: String =
    s"""WITH $vecsDouble,
       |all_v AS (
       |  SELECT vec_id, vec FROM v
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id,
       |    [vec[i] + CAST((i % 5) - 2 AS DOUBLE) * 0.01 for i in range(1, len(vec) + 1)] AS vec
       |  FROM v WHERE vec_id % 10 = 0),
       |s AS (SELECT vec_id AS id, vec, ${signature("vec", 16)} AS sig FROM all_v),
       |blocks AS (
       |  SELECT id, vec,
       |    unnest([CAST(b AS VARCHAR) || '|' || substr(sig, 1 + b * 4, 4)
       |            for b in range(0, 4)]) AS band
       |  FROM s),
       |-- same bounded-bucket candidate generation as operators.Buckets:
       |-- degenerate band values (> 500 members) are dropped on BOTH engines
       |bc AS (SELECT band FROM blocks GROUP BY band HAVING COUNT(*) BETWEEN 2 AND 500)
       |SELECT DISTINCT a.id AS id_1, b.id AS id_2,
       |  round(${cosine("a.vec", "b.vec")}, 6) AS cosine
       |FROM blocks a JOIN blocks b ON a.band = b.band AND a.id < b.id
       |JOIN bc ON a.band = bc.band
       |WHERE ${cosine("a.vec", "b.vec")} >= 0.95""".stripMargin

  /** pipeline_classifier_centroid twin: the exact ×10⁶ fixed-point
    * Rocchio trainer replayed in SQL — bag-of-lexicon-word counts,
    * argmax-rule labels, train-split class sums, w = μ₊ − μ₋ and the
    * midpoint threshold, all in truncating integer arithmetic
    * (`//` here ≡ engine `DIV`). Generated from the SAME
    * [[ExtQueries.langLexicon]] the engine trains from.
    */
  val classifierCentroid: String = {
    val lexWords = ExtQueries.langLexicon.map(_._1)
    val langs = ExtQueries.langLexicon.map(_._2).distinct.sorted
    val idx = lexWords.indices
    val byLang = ExtQueries.langLexicon.zipWithIndex.groupMap(_._1._2)(_._2)
    def langSum(l: String) = byLang(l).map(i => s"x$i").mkString(" + ")
    val gm = s"greatest(${langs.map(l => s"(${langSum(l)})").mkString(", ")})"
    val cnts = idx.map(j =>
      s"CAST(len(list_filter(string_split(text, ' '), w -> w = '${lexWords(j)}')) AS BIGINT) AS x$j")
      .mkString(",\n    ")
    val spsn = idx.map(j =>
      s"CAST(SUM(CASE WHEN label = 1 THEN x$j ELSE 0 END) AS BIGINT) AS sp$j, " +
        s"CAST(SUM(CASE WHEN label = -1 THEN x$j ELSE 0 END) AS BIGINT) AS sn$j")
      .mkString(",\n    ")
    val mus = idx.map(j => s"(sp$j * 1000000 // np) AS mp$j, (sn$j * 1000000 // nn) AS mn$j")
      .mkString(",\n    ")
    val ws = idx.map(j => s"(mp$j - mn$j) AS w$j").mkString(",\n    ")
    val bExpr = idx.map(j => s"(mp$j - mn$j) * (mp$j + mn$j)").mkString(" + ")
    val score = idx.map(j => s"w$j * x$j").mkString(" + ")
    s"""WITH fx AS (
       |  SELECT doc_id,
       |    $cnts
       |  FROM documents
       |), f AS (
       |  SELECT *,
       |    CASE WHEN (${langSum("en")}) = $gm AND (${langSum("de")}) < $gm
       |      THEN 1 ELSE -1 END AS label
       |  FROM fx
       |), st AS (
       |  SELECT
       |    GREATEST(CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT), 1) AS np,
       |    GREATEST(CAST(SUM(CASE WHEN label = -1 THEN 1 ELSE 0 END) AS BIGINT), 1) AS nn,
       |    $spsn
       |  FROM f WHERE doc_id % 10 <> 0
       |), mu AS (
       |  SELECT
       |    $mus
       |  FROM st
       |), wv AS (
       |  SELECT
       |    $ws,
       |    CAST($bExpr AS BIGINT) AS b
       |  FROM mu
       |)
       |SELECT f.doc_id, CAST(f.label AS BIGINT) AS label,
       |  CASE WHEN f.doc_id % 10 <> 0 THEN 'train' ELSE 'test' END AS split,
       |  CAST(2 * ($score) * 1000000 - b AS BIGINT) AS margin,
       |  CAST(CASE WHEN 2 * ($score) * 1000000 - b > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred,
       |  (CASE WHEN 2 * ($score) * 1000000 - b > 0 THEN 1 ELSE -1 END) = f.label AS correct
       |FROM f, wv""".stripMargin
  }

  /** Fuzzy ER: same typo fixture, deletion-key blocking, and
    * Levenshtein ≤ 2 re-score; the (dist, key) argmin rides one
    * integer encoding (dist·10⁸ + key) so no struct-min is needed.
    */
  val erFuzzyMatch: String =
    """WITH clean AS (SELECT c_custkey AS key, c_name AS name FROM customer),
      |dirty AS (
      |  SELECT key + 5000000 AS dirty_id,
      |    CASE key % 4
      |      WHEN 0 THEN name
      |      WHEN 1 THEN substr(name, 1, p - 1) || substr(name, p + 1)
      |      WHEN 2 THEN substr(name, 1, p - 1) || 'x' || substr(name, p + 1)
      |      ELSE substr(name, 1, p - 1) || substr(name, p + 1, 1)
      |           || substr(name, p, 1) || substr(name, p + 2)
      |    END AS name
      |  FROM (SELECT key, name,
      |          CAST(10 + ((key // 4) % 8) AS INTEGER) AS p FROM clean)),
      |dk_d AS (
      |  SELECT dirty_id, name AS d_name,
      |    unnest(list_append(
      |      list_transform(range(1, len(name) + 1),
      |        i -> substr(name, 1, CAST(i AS INTEGER) - 1)
      |             || substr(name, CAST(i AS INTEGER) + 1)),
      |      name)) AS k
      |  FROM dirty),
      |dk_c AS (
      |  SELECT key, name AS c_name,
      |    unnest(list_append(
      |      list_transform(range(1, len(name) + 1),
      |        i -> substr(name, 1, CAST(i AS INTEGER) - 1)
      |             || substr(name, CAST(i AS INTEGER) + 1)),
      |      name)) AS k
      |  FROM clean),
      |cand AS (
      |  SELECT DISTINCT dirty_id, d_name, key, c_name
      |  FROM dk_d JOIN dk_c USING (k)),
      |scored AS (
      |  SELECT dirty_id, key, levenshtein(d_name, c_name) AS dist
      |  FROM cand WHERE levenshtein(d_name, c_name) <= 2),
      |best AS (
      |  SELECT dirty_id,
      |    min(dist * 100000000 + key) AS enc,
      |    count(*) AS n_cand
      |  FROM scored GROUP BY dirty_id)
      |SELECT d.dirty_id,
      |  b.enc % 100000000 AS matched_key,
      |  b.enc // 100000000 AS dist,
      |  COALESCE(b.n_cand, 0) AS n_cand
      |FROM dirty d LEFT JOIN best b USING (dirty_id)""".stripMargin

  /** Hybrid-RRF twin: both legs as ROW_NUMBER CTEs with the same total
    * orders, integer `//` fusion, full outer join with coalesced keys.
    */
  val simHybridRrf: String =
    s"""WITH qd AS (
       |  SELECT doc_id AS query_id, list_distinct(string_split(text, ' ')) AS w
       |  FROM documents WHERE doc_id % 25 = 0),
       |cd AS (SELECT doc_id AS cand_id, list_distinct(string_split(text, ' ')) AS w
       |       FROM documents),
       |qt AS (SELECT query_id, unnest(w) AS word FROM qd),
       |ct AS (SELECT cand_id, unnest(w) AS word FROM cd),
       |ov AS (
       |  SELECT query_id, cand_id, COUNT(*) AS n_shared
       |  FROM ct JOIN qt USING (word)
       |  WHERE query_id <> cand_id GROUP BY 1, 2),
       |lex AS (
       |  SELECT query_id, cand_id, CAST(rn AS BIGINT) AS r_lex FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY n_shared DESC NULLS LAST, cand_id ASC NULLS FIRST) AS rn
       |    FROM ov) WHERE rn <= 20),
       |vv AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       |       FROM embeddings),
       |sc AS (
       |  SELECT qv.vec_id AS query_id, cv.vec_id AS cand_id,
       |    ${cosine("qv.vec", "cv.vec")} AS cos
       |  FROM vv cv JOIN (SELECT * FROM vv WHERE vec_id % 25 = 0) qv
       |    ON qv.vec_id <> cv.vec_id),
       |vec AS (
       |  SELECT query_id, cand_id, CAST(rn AS BIGINT) AS r_vec FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC NULLS LAST, cand_id ASC NULLS FIRST) AS rn
       |    FROM sc) WHERE rn <= 20),
       |f AS (
       |  SELECT COALESCE(lex.query_id, vec.query_id) AS query_id,
       |         COALESCE(lex.cand_id, vec.cand_id) AS cand_id, r_lex, r_vec,
       |    COALESCE(1000000 // (60 + r_lex), 0)
       |      + COALESCE(1000000 // (60 + r_vec), 0) AS rrf_fp
       |  FROM lex FULL OUTER JOIN vec
       |    ON lex.query_id = vec.query_id AND lex.cand_id = vec.cand_id)
       |SELECT query_id, CAST(rn AS BIGINT) AS rank, cand_id, rrf_fp, r_lex, r_vec
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rrf_fp DESC NULLS LAST, cand_id ASC NULLS FIRST) AS rn
       |  FROM f)
       |WHERE rn <= 5""".stripMargin

  /** Compaction-planner twin: same inventory, same conditional-sum
    * window, same size-desc total order.
    */
  val layoutCompaction: String =
    """WITH f AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS part_day, event_type,
      |    user_id % (CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 8 END) AS writer,
      |    CAST(COUNT(*) AS BIGINT) AS size_rows
      |  FROM events GROUP BY 1, 2, 3),
      |c AS (
      |  SELECT *, CAST(COALESCE(SUM(CASE WHEN size_rows < 64 THEN size_rows ELSE 0 END)
      |      OVER (PARTITION BY part_day
      |        ORDER BY size_rows DESC NULLS LAST, event_type ASC NULLS FIRST,
      |                 writer ASC NULLS FIRST
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
      |  FROM f)
      |SELECT part_day, event_type, writer, size_rows,
      |  size_rows < 64 AS rewrite,
      |  CASE WHEN size_rows < 64 THEN cum_before // 64 END AS out_bin
      |FROM c""".stripMargin

  /** Expectation-suite twin: the same six checks off one counts CTE;
    * ppm is integer `//` like the Spark side's DIV.
    */
  val qaExpectationSuite: String =
    """WITH agg AS (
      |  SELECT COUNT(*) AS n_rows,
      |    CAST(SUM(CASE WHEN c_name IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_name,
      |    CAST(SUM(CASE WHEN c_acctbal IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bal,
      |    COUNT(DISTINCT c_custkey) AS n_key_distinct,
      |    CAST(SUM(CASE WHEN c_acctbal BETWEEN 0.0 AND 9000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bal_range,
      |    CAST(SUM(CASE WHEN c_mktsegment IN
      |      ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_seg,
      |    (SELECT COUNT(*) FROM customer c
      |     WHERE c.c_nationkey IN (SELECT n_nationkey FROM nation)) AS n_ref_ok
      |  FROM customer),
      |checks AS (
      |  SELECT CAST(1 AS BIGINT) AS check_no, 'completeness_c_name' AS "check",
      |    n_name * 1000000 // n_rows AS metric_ppm, CAST(1000000 AS BIGINT) AS threshold_ppm FROM agg
      |  UNION ALL SELECT 2, 'completeness_c_acctbal', n_bal * 1000000 // n_rows, 1000000 FROM agg
      |  UNION ALL SELECT 3, 'uniqueness_c_custkey', n_key_distinct * 1000000 // n_rows, 1000000 FROM agg
      |  UNION ALL SELECT 4, 'range_c_acctbal_0_9000', n_bal_range * 1000000 // n_rows, 990000 FROM agg
      |  UNION ALL SELECT 5, 'domain_c_mktsegment', n_seg * 1000000 // n_rows, 1000000 FROM agg
      |  UNION ALL SELECT 6, 'ref_c_nationkey_in_nation', n_ref_ok * 1000000 // n_rows, 1000000 FROM agg)
      |SELECT check_no, "check", metric_ppm, threshold_ppm,
      |  metric_ppm >= threshold_ppm AS passed
      |FROM checks""".stripMargin

  /** The five-stage curation funnel: each stage rule is the gated
    * oracle verbatim (lang argmax, Gopher conjunction, 8-gram eval
    * overlap, min-id dedup, digest-ordered quota), composed as
    * shrinking CTEs; the audit rows are one-row selects off the
    * counts CTE.
    */
  def curationFunnel: String = {
    val lexValues = ExtQueries.langLexicon
      .map { case (w, l) => s"('$w','$l')" }.mkString(", ")
    s"""WITH lex(word, lex_lang) AS (VALUES $lexValues),
       |ad AS (
       |  SELECT doc_id, text, source FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text, source
       |  FROM documents WHERE doc_id % 10 = 0),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM ad),
       |hits AS (
       |  SELECT doc_id, lex_lang, COUNT(*) AS hits
       |  FROM tok JOIN lex USING (word) GROUP BY 1, 2),
       |best AS (
       |  SELECT doc_id, lex_lang, ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY hits DESC NULLS LAST, lex_lang ASC NULLS FIRST) AS rn
       |  FROM hits),
       |flang AS (SELECT doc_id FROM best WHERE rn = 1 AND lex_lang = 'en'),
       |fqual AS (
       |  SELECT doc_id FROM ad
       |  WHERE len(string_split(text, ' ')) >= 10 AND len(string_split(text, ' ')) <= 100000
       |   AND (CAST(length(text) AS DOUBLE) - CAST(len(string_split(text, ' ')) - 1 AS DOUBLE))
       |         / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 2.0
       |   AND (CAST(length(text) AS DOUBLE) - CAST(len(string_split(text, ' ')) - 1 AS DOUBLE))
       |         / CAST(len(string_split(text, ' ')) AS DOUBLE) <= 12.0
       |   AND CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
       |         / CAST(length(text) AS DOUBLE) >= 0.5
       |   AND len(list_filter(string_split(text, ' '),
       |         w -> w IN ('the','data','order','key','value'))) >= 1),
       |w AS (SELECT doc_id, string_split(text, ' ') AS words FROM ad),
       |sh AS (
       |  SELECT doc_id,
       |    unnest(CASE WHEN len(words) < 8 THEN []::VARCHAR[]
       |                ELSE [array_to_string(words[i:i+7], ' ')
       |                      for i in range(1, len(words) - 6)] END) AS shingle
       |  FROM w),
       |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
       |contam AS (
       |  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (shingle)
       |  WHERE s.doc_id % 50 <> 0),
       |f AS (
       |  SELECT doc_id, source, md5(text) AS digest,
       |    doc_id IN (SELECT doc_id FROM flang) AS f_lang,
       |    doc_id IN (SELECT doc_id FROM fqual) AS f_qual,
       |    (doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM contam)) AS f_decon
       |  FROM ad),
       |s3 AS (SELECT * FROM f WHERE f_lang AND f_qual AND f_decon),
       |dd AS (
       |  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY digest
       |    ORDER BY doc_id ASC NULLS FIRST) AS rn FROM s3),
       |s4 AS (SELECT s3.* FROM s3 JOIN dd USING (doc_id) WHERE dd.rn = 1),
       |qt AS (
       |  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY source
       |    ORDER BY digest ASC NULLS FIRST, doc_id ASC NULLS FIRST) AS rank
       |  FROM s4),
       |s5 AS (SELECT s4.doc_id FROM s4 JOIN qt USING (doc_id) WHERE qt.rank <= 8),
       |c AS (SELECT
       |  (SELECT COUNT(*) FROM ad) AS n0,
       |  (SELECT COUNT(*) FROM f WHERE f_lang) AS n1,
       |  (SELECT COUNT(*) FROM f WHERE f_lang AND f_qual) AS n2,
       |  (SELECT COUNT(*) FROM s3) AS n3,
       |  (SELECT COUNT(*) FROM s4) AS n4,
       |  (SELECT COUNT(*) FROM s5) AS n5)
       |SELECT CAST(1 AS BIGINT) AS stage_no, 'lang_id' AS stage,
       |  n0 AS rows_in, n1 AS rows_out, n0 - n1 AS rows_dropped FROM c
       |UNION ALL SELECT 2, 'quality', n1, n2, n1 - n2 FROM c
       |UNION ALL SELECT 3, 'decontaminate', n2, n3, n2 - n3 FROM c
       |UNION ALL SELECT 4, 'dedup_exact', n3, n4, n3 - n4 FROM c
       |UNION ALL SELECT 5, 'source_quota', n4, n5, n4 - n5 FROM c""".stripMargin
  }

  /** BM25 twin: the same postings/df/stats CTEs, the same two exact
    * integer `//` quotients (all operands positive, so DuckDB floor
    * division ≡ Spark DIV), the same associative integer score sum.
    */
  val textBm25TopK: String = textBm25TopKSql("")

  /** text_bm25_purge_topk twin: the same one-shot computation over the
    * PURGED corpus — filtering `doc_id % 89 = 0` out of the corpus CTE
    * moves N, L and every touched df, so the restated scores equal the
    * folded-retraction spines only if the retraction was exact.
    */
  val textBm25PurgeTopK: String = textBm25TopKSql(" WHERE doc_id % 89 <> 0")

  /** Feed-maintained index: the full Robertson computation over the
    * HEAD membership (create %3=0, append %3=1, DV-delete %5=0) —
    * the folded index must serve identical top-k. Query ids use
    * % 23 here: the shared % 25 rule is a subset of the deleted
    * % 5 roster, which would leave the gate vacuous.
    */
  val layoutIndexFromFeed: String =
    textBm25TopKSql(" WHERE doc_id % 3 IN (0, 1) AND doc_id % 5 <> 0",
      queryMod = 23)

  /** text_bm25_maintain_topk twin: the drift decision replayed from
    * exact posting counts — n_base = yesterday's (`doc_id % 3 = 0`)
    * distinct (doc, word) postings, n_new = the batch's, rebuilt =
    * the `n_new·2 > n_base` trigger (this split trips it) — plus
    * top-k aggregates off the full-corpus one-shot computation (the
    * row set is branch-invariant: fold and compaction hold identical
    * postings).
    */
  val textBm25MaintainTopK: String =
    s"""WITH ${textBm25Ctes("")},
       |topk AS (
       |  SELECT query_id, cand_id, score_fp FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_fp DESC NULLS LAST, cand_id ASC NULLS FIRST) AS rn
       |    FROM pp) WHERE rn <= 10),
       |counts AS (SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM tf WHERE doc_id % 3 = 0) AS n_base,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM tf WHERE doc_id % 3 <> 0) AS n_new)
       |SELECT n_base, n_new, n_new * 2 > n_base AS rebuilt,
       |  CAST(COUNT(*) AS BIGINT) AS n_topk,
       |  CAST(SUM(score_fp) AS BIGINT) AS score_sum
       |FROM topk CROSS JOIN counts GROUP BY 1, 2, 3""".stripMargin

  /** sim_hybrid_stored_rrf twin: the BM25 CTEs (rank <= 20 lexical
    * leg) + the trained-IVF CTEs (rank <= 20 vector leg, 3 Lloyd
    * iterations + nprobe-2 assignment — the simIvfKmeansTopK chain
    * verbatim) + exact-integer reciprocal-rank fusion. Going through
    * stored postings/spines and stored centroid/list artifacts must
    * change nothing — both index builds are deterministic.
    */
  val simHybridStoredRrf: String =
    s"""WITH ${textBm25Ctes("")},
       |$vecsDouble,
       |c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC NULLS FIRST) - 1 AS INTEGER) AS cid,
       |         vec AS centroid
       |  FROM (SELECT vec_id, vec FROM v ORDER BY vec_id ASC NULLS FIRST LIMIT 8)),
       |${(1 to 3).map(kmeansIter(_)).mkString(",\n")},
       |lists AS (
       |  SELECT id AS neighbor_id, vec AS c_vec, cid FROM (
       |    SELECT x.vec_id AS id, x.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${sqDist("x.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM v x CROSS JOIN c3 c)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT id AS query_id, vec AS q_vec, cid FROM (
       |    SELECT q.vec_id AS id, q.vec, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${sqDist("q.vec", "c.centroid")} ASC NULLS LAST,
       |                 c.cid ASC NULLS FIRST) AS rn
       |    FROM v q CROSS JOIN c3 c WHERE q.vec_id % 25 = 0)
       |  WHERE rn <= 2),
       |scored AS (
       |  SELECT p.query_id, l.neighbor_id, ${cosine("p.q_vec", "l.c_vec")} AS score
       |  FROM lists l JOIN probes p USING (cid)
       |  WHERE p.query_id <> l.neighbor_id),
       |vec20 AS (SELECT query_id, cand_id, r_vec FROM (
       |  SELECT query_id, neighbor_id AS cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS r_vec
       |  FROM scored) WHERE r_vec <= 20),
       |lex20 AS (SELECT query_id, cand_id, r_lex FROM (
       |  SELECT query_id, cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_fp DESC NULLS LAST, cand_id ASC NULLS FIRST) AS r_lex
       |  FROM pp) WHERE r_lex <= 20),
       |f AS (SELECT COALESCE(l.query_id, vv.query_id) AS query_id,
       |  COALESCE(l.cand_id, vv.cand_id) AS cand_id, l.r_lex, vv.r_vec,
       |  COALESCE(1000000 // (60 + l.r_lex), 0)
       |    + COALESCE(1000000 // (60 + vv.r_vec), 0) AS rrf_fp
       |  FROM lex20 l FULL OUTER JOIN vec20 vv
       |    ON l.query_id = vv.query_id AND l.cand_id = vv.cand_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, cand_id,
       |  CAST(rrf_fp AS BIGINT) AS rrf_fp, r_lex, r_vec FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rrf_fp DESC NULLS LAST, cand_id ASC NULLS FIRST) AS rank
       |  FROM f)
       |WHERE rank <= 5""".stripMargin

  private def textBm25TopKSql(corpusWhere: String, queryMod: Int = 25): String =
    s"""WITH ${textBm25Ctes(corpusWhere, queryMod)}
      |SELECT query_id, CAST(rn AS BIGINT) AS rank, cand_id, score_fp, n_terms
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY score_fp DESC NULLS LAST, cand_id ASC NULLS FIRST) AS rn
      |  FROM pp)
      |WHERE rn <= 10""".stripMargin

  private def textBm25Ctes(corpusWhere: String, queryMod: Int = 25): String =
    s"""toks AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |    unnest(string_split(text, ' ')) AS word
      |  FROM documents$corpusWhere),
      |tf AS (SELECT doc_id, dl, word, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3),
      |wdf AS (SELECT *, COUNT(*) OVER (PARTITION BY word) AS df FROM tf),
      |st AS (SELECT COUNT(*) AS n,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS l FROM documents$corpusWhere),
      |qw AS (SELECT DISTINCT doc_id AS query_id, word FROM toks WHERE doc_id % $queryMod = 0),
      |sc AS (
      |  SELECT query_id, c.doc_id AS cand_id,
      |    ((2 * (n - df) + 1) * 1000 // (2 * df + 1)) * tf * 2200000
      |      // (tf * 1000000 + 300000 + (900000 * dl * n) // l) AS term_fp
      |  FROM wdf c JOIN qw USING (word) CROSS JOIN st
      |  WHERE query_id <> c.doc_id),
      |pp AS (
      |  SELECT query_id, cand_id, CAST(SUM(term_fp) AS BIGINT) AS score_fp,
      |    COUNT(*) AS n_terms
      |  FROM sc GROUP BY 1, 2)""".stripMargin

  /** k-anonymity twin: the same three-rung generalization ladder as
    * shrinking CTEs; floor(double/1000) is the same IEEE op on both
    * engines (incl. negative balances — DIV would floor differently).
    */
  val qaKAnonymity: String =
    """WITH g0 AS (
      |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band, COUNT(*) AS n
      |  FROM customer GROUP BY 1, 2, 3),
      |ok0 AS (SELECT nation, segment, CAST(band AS VARCHAR) AS bal_band,
      |        CAST(0 AS BIGINT) AS level, n FROM g0 WHERE n >= 4),
      |g1 AS (SELECT nation, segment, CAST(SUM(n) AS BIGINT) AS n
      |       FROM g0 WHERE n < 4 GROUP BY 1, 2),
      |ok1 AS (SELECT nation, segment, '*' AS bal_band,
      |        CAST(1 AS BIGINT) AS level, n FROM g1 WHERE n >= 4),
      |g2 AS (SELECT nation, CAST(SUM(n) AS BIGINT) AS n
      |       FROM g1 WHERE n < 4 GROUP BY 1),
      |u AS (
      |  SELECT * FROM ok0
      |  UNION ALL SELECT * FROM ok1
      |  UNION ALL SELECT nation, '*' AS segment, '*' AS bal_band,
      |    CAST(2 AS BIGINT) AS level, n FROM g2)
      |SELECT nation, segment, bal_band, level, n, n >= 4 AS k_anonymous
      |FROM u""".stripMargin

  /** Global-ids twin: the two-phase bucketed rank must equal the naive
    * global ROW_NUMBER — the oracle states the SPEC form directly.
    */
  val pipelineGlobalIds: String =
    """WITH r AS (
      |  SELECT doc_id, n_chars,
      |    CAST(ROW_NUMBER() OVER (
      |      ORDER BY n_chars ASC NULLS FIRST, doc_id ASC NULLS FIRST) - 1
      |      AS BIGINT) AS global_id
      |  FROM documents)
      |SELECT doc_id, n_chars, global_id,
      |  global_id // 256 AS shard_id, global_id % 256 AS pos_in_shard
      |FROM r""".stripMargin

  /** Stratified-sampler twin: the same Hamilton allocation in integer
    * `//`/`%` over the counts CTE, the same digest-ordered quota pick.
    */
  val sampleStratifiedProportional: String =
    """WITH d AS (
      |  SELECT doc_id, lang, md5(text) AS digest FROM documents),
      |c AS (SELECT lang, COUNT(*) AS cnt FROM d GROUP BY 1),
      |n AS (SELECT COUNT(*) AS __n FROM documents),
      |a0 AS (
      |  SELECT lang, cnt, 100 * cnt // __n AS base, (100 * cnt) % __n AS rem
      |  FROM c CROSS JOIN n),
      |a1 AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (
      |      ORDER BY rem DESC NULLS LAST, lang ASC NULLS FIRST) AS BIGINT) AS rk,
      |    CAST(SUM(base) OVER () AS BIGINT) AS tot
      |  FROM a0),
      |al AS (
      |  SELECT lang,
      |    base + CASE WHEN rk <= 100 - tot THEN 1 ELSE 0 END AS quota
      |  FROM a1),
      |r AS (
      |  SELECT doc_id, lang,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY digest ASC NULLS FIRST, doc_id ASC NULLS FIRST)
      |      AS BIGINT) AS sample_rank
      |  FROM d)
      |SELECT r.doc_id, r.lang, r.sample_rank, al.quota
      |FROM r JOIN al USING (lang)
      |WHERE r.sample_rank <= al.quota""".stripMargin

  /** Two-stage rerank twin: the int8-quantized shortlist CTE
    * (simQuantizedTopK's qz verbatim), exact full-dim cosine
    * re-score, both ranks carried.
    */
  val simRerankTwoStage: String =
    s"""WITH $vecsDouble,
       |qz AS (
       |  SELECT vec_id,
       |    list_transform(vec, x -> CAST(CAST(round(x / s) AS BIGINT) AS DOUBLE)) AS q
       |  FROM (
       |    SELECT vec_id, vec,
       |      CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS s
       |    FROM (SELECT vec_id, vec,
       |            list_reduce(list_transform(vec, x -> abs(x)), (a, b) -> greatest(a, b)) AS m
       |          FROM v))),
       |q8 AS (SELECT vec_id AS query_id, q AS q_vec FROM qz WHERE vec_id % 25 = 0),
       |coarse AS (
       |  SELECT q8.query_id, c.vec_id AS neighbor_id,
       |    ${cosine("q8.q_vec", "c.q")} AS cscore
       |  FROM qz c JOIN q8 ON q8.query_id <> c.vec_id),
       |short AS (
       |  SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS coarse_rank FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cscore DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rn
       |    FROM coarse) WHERE rn <= 50),
       |qf AS (SELECT vec_id AS query_id, vec AS q_vec FROM v WHERE vec_id % 25 = 0),
       |rr AS (
       |  SELECT s.query_id, s.neighbor_id, s.coarse_rank,
       |    ${cosine("qf.q_vec", "cf.vec")} AS score
       |  FROM short s
       |  JOIN v cf ON cf.vec_id = s.neighbor_id
       |  JOIN qf ON qf.query_id = s.query_id)
       |SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id,
       |  round(score, 6) AS score, coarse_rank
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY score DESC NULLS LAST, neighbor_id ASC NULLS FIRST) AS rn
       |  FROM rr)
       |WHERE rn <= 5""".stripMargin

  /** Incremental-ids twin: state ids from the restricted corpus, batch
    * ids offset by |state| — the append-stable assignment stated
    * directly off the base table.
    */
  val pipelineGlobalIdsIncremental: String =
    """WITH st AS (
      |  SELECT doc_id, n_chars,
      |    CAST(ROW_NUMBER() OVER (
      |      ORDER BY n_chars ASC NULLS FIRST, doc_id ASC NULLS FIRST) - 1
      |      AS BIGINT) AS global_id
      |  FROM documents WHERE doc_id % 7 <> 0),
      |n0 AS (SELECT COUNT(*) AS c FROM st),
      |bt AS (
      |  SELECT doc_id, n_chars,
      |    CAST(ROW_NUMBER() OVER (
      |      ORDER BY n_chars ASC NULLS FIRST, doc_id ASC NULLS FIRST) - 1 + c
      |      AS BIGINT) AS global_id
      |  FROM documents CROSS JOIN n0 WHERE doc_id % 7 = 0)
      |SELECT doc_id, n_chars, global_id, FALSE AS is_new FROM st
      |UNION ALL
      |SELECT doc_id, n_chars, global_id, TRUE AS is_new FROM bt""".stripMargin

  /** Detector-eval twin: the detector CTE is [[dedupMinhashLsh]]
    * verbatim (as a subquery); counts exact, ratios integer ppm.
    */
  val qaDedupEval: String =
    s"""WITH truth AS (
       |  SELECT doc_id AS a, doc_id + 1000000 AS b
       |  FROM documents WHERE doc_id % 10 = 0),
       |det AS (
       |  SELECT doc_id_1 AS a, doc_id_2 AS b FROM ($dedupMinhashLsh)),
       |c AS (SELECT
       |  (SELECT COUNT(*) FROM truth) AS n_truth,
       |  (SELECT COUNT(*) FROM det) AS n_detected,
       |  (SELECT COUNT(*) FROM det JOIN truth USING (a, b)) AS tp)
       |, m AS (SELECT n_truth, n_detected, tp,
       |  n_detected - tp AS fp, n_truth - tp AS fn,
       |  CASE WHEN n_detected = 0 THEN 0
       |       ELSE tp * 1000000 // n_detected END AS precision_ppm,
       |  CASE WHEN n_truth = 0 THEN 0
       |       ELSE tp * 1000000 // n_truth END AS recall_ppm
       |FROM c)
       |SELECT n_truth, n_detected, tp, fp, fn, precision_ppm, recall_ppm,
       |  CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
       |       ELSE 2 * precision_ppm * recall_ppm
       |            // (precision_ppm + recall_ppm) END AS f1_ppm
       |FROM m""".stripMargin

  /** PCA power-iteration twin: all three rounds re-derived from data
    * as CTEs; every division is the sign-split truncating form so
    * DuckDB's floor `//` agrees with Spark's toward-zero DIV on
    * negatives.
    */
  val embedPcaPower: String = {
    def signDiv(num: String, den: String) =
      s"CASE WHEN $num < 0 THEN -((-($num)) // ($den)) ELSE ($num) // ($den) END"
    def round(i: Int, prev: String) =
      s"""s$i AS (
         |  SELECT xl.vec_id, CAST(SUM(xl.x_fp * v.v_fp) AS BIGINT) AS s
         |  FROM xl JOIN $prev v USING (dim) GROUP BY xl.vec_id),
         |sm$i AS (SELECT MAX(abs(s)) AS smax FROM s$i),
         |t$i AS (
         |  SELECT vec_id, ${signDiv("s", "1 + smax // 1048576")} AS t
         |  FROM s$i CROSS JOIN sm$i),
         |vr$i AS (
         |  SELECT xl.dim, CAST(SUM(t$i.t * xl.x_fp) AS BIGINT) AS vr
         |  FROM xl JOIN t$i USING (vec_id) GROUP BY xl.dim),
         |vm$i AS (SELECT MAX(abs(vr)) AS vmax FROM vr$i),
         |v$i AS (
         |  SELECT dim, ${signDiv("vr", "1 + vmax // 1000000")} AS v_fp
         |  FROM vr$i CROSS JOIN vm$i)""".stripMargin
    s"""WITH xl AS (
       |  SELECT vec_id, CAST(u.dim AS BIGINT) AS dim,
       |    CAST(round(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT) AS x_fp
       |  FROM (
       |    SELECT vec_id,
       |      unnest([{'dim': i - 1, 'x': embedding[i]}
       |              for i in range(1, len(embedding) + 1)]) AS u
       |    FROM embeddings)),
       |v0 AS (SELECT unnest(range(0, 64)) AS dim, CAST(1000000 AS BIGINT) AS v_fp),
       |${round(1, "v0")},
       |${round(2, "v1")},
       |${round(3, "v2")}
       |SELECT dim, v_fp FROM v3""".stripMargin
  }
}
