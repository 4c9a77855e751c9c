package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `ARRAY<FLOAT>` columns.
  *
  * Determinism contract (the DuckDB hash-match gate): every floating-point
  * reduction is a LEFT FOLD in array-index order (`aggregate` here,
  * `list_reduce` in the oracle), so dot products and norms are
  * bit-identical across engines — no rounding epsilon needed.
  *
  * Scale design (100 TB): the query set is broadcast (small side); the
  * corpus is scanned once. Brute force is the exact baseline; the
  * hyperplane-LSH variant prunes the corpus to matching buckets first, so
  * the cross product shrinks from |Q|×|C| to per-bucket blocks and the
  * top-k window shuffles only (query_id) partitions.
  */
object Similarity {

  /** Element-wise double view of a float-array column. */
  private def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Left-fold dot product — bit-reproducible on any cluster layout
    * because the fold order is the array order, not partition order.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column =
    sqrt(aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x))

  /** Composed-HOF cosine — the reference formulation the oracle mirrors;
    * kept for the bitwise-equivalence test against the native expression.
    */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native codegen'd cosine (graft.functions.CosineSimilarity via the
    * GraftExtensions registry) — bit-identical to [[cosineHof]], one
    * fused loop instead of three HOF folds.
    */
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Symmetric per-vector int8 scalar quantization — the 100 TB storage
    * path for vector search: `scale = max|x| / 127`,
    * `q = round(x / scale) ∈ [-127, 127]` stored as `ARRAY<TINYINT>`
    * (4× smaller than float32, 8× than float64), `scale` kept as
    * reconstruction metadata. Cosine over the integer codes equals
    * cosine over the dequantized vectors exactly (per-vector scale
    * cancels), and because |q|≤127 every dot/norm term is an exact
    * integer below 2^53, the double fold is bit-identical to the
    * oracle's. Zero vectors take scale=1 so quantization is total.
    */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .withColumn("__m", aggregate(col("__v"), lit(0.0), (a, x) => greatest(a, abs(x))))
      .withColumn("scale", when(col("__m") === 0.0, lit(1.0)).otherwise(col("__m") / lit(127.0)))
      .withColumn("q", transform(col("__v"), x => round(x / col("scale")).cast("tinyint")))
      .select(col(idCol), col("q"), col("scale"))

  /** Exact top-k neighbors for each query vector (brute force baseline).
    * `queries` must be small enough to broadcast.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    // fan the corpus side out to cluster width (r16): the exact-cosine
    // scoring against every broadcast query ran on the one-file bench
    // scan's single split; no-op at production file counts
    val c = FanOut.widen(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("q_vec"), col("c_vec")))
    LatestPerKey.topKRanked(scored, k, Seq(col("query_id")),
        Seq(col("score").desc_nulls_last, col("neighbor_id").asc_nulls_first))
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
  }

  /** Deterministic integer hyperplane component: r_j[i] = ((i*31+j*17) mod 61) - 30.
    * Pseudo-random enough to split buckets, trivially reproducible in any
    * engine (no RNG, no hash library). The modulus must comfortably exceed
    * the widest signature: the family is periodic in j with period = the
    * modulus (j and j+m yield the SAME hyperplane), so the original mod-7
    * variant silently produced only 7 distinct hyperplanes — every
    * signature bit past the 7th repeated an earlier one, which the ANN
    * recall gate exposed (recall stopped improving as bands were added).
    */
  private def hyperplaneBit(v: Column, j: Int): Column = {
    val proj = aggregate(
      zip_with(asDouble(v), transform(sequence(lit(1), size(v)),
        i => ((i * 31 + lit(j * 17)) % 61 - 30).cast("double")), _ * _),
      lit(0.0), _ + _)
    when(proj >= 0, lit("1")).otherwise(lit("0"))
  }

  /** Banded hyperplane keys: band b = "b|" + bits [b·r, (b+1)·r) of the
    * hyperplane signature, as an array of `bands` strings. Composed-HOF
    * form, kept as the oracle-shaped reference for the bitwise-
    * equivalence test against the native expression (like cosineHof).
    */
  def hyperplaneBandsHof(v: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      concat(lit(s"$b|") +:
        (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => hyperplaneBit(v, j)): _*)): _*)

  /** Native fused banded keys (graft.functions.HyperplaneBands): all
    * bands×rows projections in ONE traversal of the vector — the HOF
    * form re-walks the array once per bit (24 traversals for the 8×3
    * ANN signature). Bit-identical to [[hyperplaneBandsHof]]: each
    * projection stays an independent left fold in array-index order.
    */
  def hyperplaneBands(v: Column, bands: Int, rowsPerBand: Int): Column =
    call_function("hyperplane_bands", v, lit(bands), lit(rowsPerBand))

  /** Approximate top-k via BANDED hyperplane LSH (OR-amplification): a
    * corpus vector is a candidate when ANY of its `bands` band keys
    * matches the query's — the AND-only single-signature form (all nBits
    * agreeing) had recall@5 of 0.03 on the near-random bench embeddings,
    * which the recall gate exposed; banding trades candidate-set size for
    * recall exactly like the minhash/simhash dedups.
    *
    * Scale shape (100 TB): queries are exploded ×bands but stay the small
    * broadcast side; the corpus is scanned once (its ×bands explode feeds
    * a broadcast join — no corpus shuffle). Scoring happens BEFORE the
    * (query, neighbor) dedup: every band collision of a pair yields the
    * SAME score, so `first(score)` is deterministic, the dedup plans as a
    * codegen'd partial+final HashAggregate on two longs (duplicates
    * collapse map-side), and the shuffle carries (q, n, score) scalars —
    * deduping first would drag the c_vec array through a SortAggregate
    * (two sorts + vector-width shuffle rows, observed in the plan). The
    * recomputed cosine on multi-band collisions is the cheaper side of
    * that trade: most colliding pairs share exactly one band.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bands: Int = 8, rowsPerBand: Int = 3,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      explode(hyperplaneBands(col(vecCol), bands, rowsPerBand)).as("band"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      explode(hyperplaneBands(col(vecCol), bands, rowsPerBand)).as("band"))
    val scored = c.join(broadcast(qb), Seq("band"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("c_vec")).as("score"))
      .groupBy("query_id", "neighbor_id")
      .agg(first(col("score")).as("score"))
    LatestPerKey.topKRanked(scored, k, Seq(col("query_id")),
        Seq(col("score").desc_nulls_last, col("neighbor_id").asc_nulls_first))
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
  }

  /** IVF-style ANN: coarse-quantize the corpus into `nlist` inverted
    * lists (nearest centroid by cosine, ties → lowest centroid id);
    * queries probe their `nprobe` nearest lists and score exactly
    * within them (IVFFlat structure, cf. Jégou et al. 2011 §III).
    *
    * Centroids here are a deterministic stand-in ("train" = take the
    * `nlist` lowest-id vectors); production would plug in offline
    * k-means centroids — the list-assignment/probe plumbing is
    * identical. Scale: assignment is a broadcast of `nlist` centroids +
    * one corpus scan; the probe join shuffles on list id, so each list
    * is an independent block (same property as the LSH buckets).
    */
  /** Cosine-nearest coarse-centroid assignment (IVF list build / probe):
    * keep the top-`keep` centroids per vector, ties → lowest cid.
    */
  private[graft] def ivfAssign(df: DataFrame, centroids: DataFrame,
                               id: String, vec: String, keep: Int): DataFrame =
    LatestPerKey.topKRanked(
      df.crossJoin(broadcast(centroids))
        .withColumn("c_score", cosine(col(vec), col("c_centroid"))),
      keep, Seq(col(id)),
      Seq(col("c_score").desc_nulls_last, col("cid").asc_nulls_first))
      .select(col(id), col(vec), col("cid"))

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 8, nprobe: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = corpus.filter(col(idCol) < nlist)
      .select(col(idCol).as("cid"), col(vecCol).as("c_centroid"))
    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame =
      ivfAssign(df, centroids, id, vec, keep)
    val lists = assign(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
      "neighbor_id", "c_vec", keep = 1)
    val probes = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      "query_id", "q_vec", keep = nprobe)
    val scored = lists.join(probes, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("q_vec"), col("c_vec")))
      .dropDuplicates("query_id", "neighbor_id")
    LatestPerKey.topKRanked(scored, k, Seq(col("query_id")),
        Seq(col("score").desc_nulls_last, col("neighbor_id").asc_nulls_first))
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
  }

  /** Product-quantization codebooks (Jégou et al. 2011 §II): the D-dim
    * space splits into `m` contiguous subspaces of `dsub` dims; subspace
    * j's codebook is the j-th subvector of the `ksub` lowest-id corpus
    * vectors — the same deterministic "train" stand-in [[ivfTopK]]
    * documents (production plugs per-subspace k-means centroids into the
    * identical encode/score plumbing; `KMeans.fit` over `slice(v, ...)`
    * IS that trainer). Driver holds only m×ksub×dsub doubles — same
    * footprint class as the k-means centroid pulls.
    */
  def pqCodebooks(corpus: DataFrame, m: Int, ksub: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding"): IndexedSeq[IndexedSeq[Array[Double]]] = {
    val rows = corpus
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .orderBy(col(idCol).asc_nulls_first).limit(ksub)
      .collect()
    require(rows.length == ksub, s"pqCodebooks: corpus has < $ksub vectors")
    val base = rows.map(_.getSeq[Double](1).toArray)
    val dsub = base.head.length / m
    require(base.head.length == m * dsub, s"pqCodebooks: dim ${base.head.length} not divisible by m=$m")
    (0 until m).map(j => (0 until ksub).map(c => base(c).slice(j * dsub, (j + 1) * dsub)).toIndexedSeq)
  }

  /** PQ-encode the corpus: per subspace, argmin squared-L2 against the
    * codebook via the native `nearest_centroid` expression (one fused
    * loop per subspace, zero shuffle — the same 100 TB shape as the
    * k-means assignment), then pack the m 4-bit codes into ONE BIGINT.
    * The packed word is the stored form: 8 bytes per vector where the
    * float32 original is 4·D — a 32× compression at D=64, which is the
    * entire point of PQ at 100 TB (the corpus never re-materializes its
    * vectors at query time; scoring runs on codes + per-query lookup
    * tables). Ties keep the lowest code (strict-< first-min), matching
    * the oracle's `ORDER BY d2, c` rn=1.
    *
    * The ADC fold itself is the native `pq_adc_sum` expression (the
    * composed-HOF `aggregate(sequence(...), acc + element_at(...))`
    * form ran interpreted in the corpus×queries hot loop and measured
    * 1.87 s vs the exact scan's 0.52 s at sf0.1 — [[pqAdcSumHof]] keeps
    * that form as the bit-parity reference, like cosineHof).
    */
  def pqEncode(corpus: DataFrame, codebooks: IndexedSeq[IndexedSeq[Array[Double]]],
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = codebooks.length
    val ksub = codebooks.head.length
    require(ksub <= 16, s"pqEncode: 4-bit packing requires ksub <= 16, got $ksub")
    val dsub = codebooks.head.head.length
    val codes = (0 until m).map { j =>
      call_function("nearest_centroid",
        slice(col("__v"), j * dsub + 1, dsub),
        array(codebooks(j).map(c => array(c.toIndexedSeq.map(lit(_)): _*)): _*))
        .getField("cid")
    }
    // disjoint 4-bit lanes: + is exactly | here, and the oracle replays
    // it as SUM(code * 2^(4j)) in exact integer arithmetic
    val packed = codes.zipWithIndex
      .map { case (c, j) => shiftleft(c.cast("long"), 4 * j) }
      .reduce(_ + _)
    corpus.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .withColumn("packed", packed)
      .select(col(idCol), col("packed"))
  }

  /** The composed-HOF reference form of the per-query PQ dot table
    * (oracle-shaped), kept for the bitwise-equivalence spec like
    * cosineHof/nearestHof.
    */
  private[graft] def pqLutHof(qVec: Column, cb: IndexedSeq[IndexedSeq[Array[Double]]]): Column = {
    val dsub = cb.head.head.length
    array(cb.indices.flatMap { j =>
      val sub = slice(qVec, j * dsub + 1, dsub)
      cb(j).map(c =>
        aggregate(zip_with(sub, array(c.toIndexedSeq.map(lit(_)): _*), _ * _), lit(0.0), _ + _))
    }: _*)
  }

  /** The composed-HOF reference form of the ADC fold (oracle-shaped),
    * kept for the bitwise-equivalence spec like cosineHof/nearestHof.
    */
  private[graft] def pqAdcSumHof(packedCol: String, tableCol: String, m: Int, ksub: Int): Column =
    expr(
      s"""aggregate(sequence(0, ${m - 1}), CAST(0.0 AS DOUBLE),
         |  (acc, j) -> acc + element_at($tableCol,
         |      j * $ksub + CAST(shiftright($packedCol, 4 * j) & 15 AS INT) + 1))""".stripMargin)

  /** Asymmetric-distance (ADC) top-k over PQ codes: each query builds an
    * m×ksub lookup table of subspace dot products against the codebook
    * (plus the query-independent reconstruction-norm table), and a corpus
    * "vector" is scored as score = Σ_j lut[j][code_j] /
    * (‖q‖ · sqrt(Σ_j n2[j][code_j])) — cosine against the RECONSTRUCTED
    * corpus vector, computed without ever touching it (Jégou 2011 §III).
    *
    * Scale shape (100 TB): the corpus side carries only (id, packed
    * BIGINT); queries (with their LUTs — m·ksub doubles each) broadcast;
    * per corpus row the score is an m-step fold of table lookups — no
    * D-dim arithmetic, no corpus shuffle, and 32× less corpus IO than
    * the exact scan. Bit-parity contract with the DuckDB twin: every
    * per-subspace dot/norm is a left fold in array-index order, the
    * j-summations fold in j order with exact 0.0 init, and the final
    * divide is `dot / (normq · sqrt(n2))` in exactly that op order.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, ksub: Int = 16,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = pqCodebooks(corpus, m, ksub, idCol, vecCol)
    val encoded = pqEncode(corpus, cb, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("packed"))
    // per-query dot table as ONE native expression with the codebook
    // baked in — the composed-HOF table (m·ksub aggregate/zip_with/slice
    // folds) was ~8k Catalyst nodes that optimizer+codegen re-walked
    // every run (see PqLut scaladoc; pqLutHof keeps the reference form).
    // Both tables are FLAT row-major m×ksub arrays (PqAdcSum scaladoc:
    // nested tables cost one ArrayData view alloc per subspace per row).
    val lut = call_function("pq_lut", col("q_vec"),
      typedLit(cb.map(_.map(_.toIndexedSeq))))
    // reconstruction-norm table: Σ c_i² per codeword, folded i-ascending
    // from exact 0.0 on the DRIVER — query-independent, so it is baked
    // into the pq_adc_score expression as a primitive double[]; the op
    // sequence is identical IEEE arithmetic to the oracle's list_reduce
    // fold
    val n2flat = cb.flatMap(_.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    })
    val q = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec"))
      .withColumn("lut", lut)
      .withColumn("q_norm", norm(col("q_vec")))
      .select(col("query_id"), col("lut"), col("q_norm"))
    // project to (query_id, neighbor_id, score) BEFORE the top-k: the
    // rank shuffle must carry three scalars per row, not the m·ksub·2
    // lookup tables scoring already consumed (lesson of PLANS.md #7).
    // The score is ONE fused native call (pq_adc_score) — the composed
    // two-pq_adc_sum form paid a boxed-literal lookup + an extra
    // dispatch per row (see PqAdcScore scaladoc; the composition stays
    // spec-asserted bit-identical).
    val scored = encoded.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        call_function("pq_adc_score", col("packed"), col("lut"), col("q_norm"),
          typedLit(n2flat), lit(ksub)).as("score"))
    LatestPerKey.topKRanked(scored, k, Seq(col("query_id")),
        Seq(col("score").desc_nulls_last, col("neighbor_id").asc_nulls_first))
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
  }

  /** IVF-PQ: the full production ANN architecture (Jégou 2011) —
    * coarse-quantize the corpus into `nlist` inverted lists (the
    * [[ivfTopK]] convention), store each vector as ONE packed PQ code
    * word, and answer queries by probing `nprobe` lists with ADC
    * scoring (the [[pqTopK]] machinery) — candidates shrink to the
    * probed lists AND the corpus is stored 32× smaller; the two
    * approximations compose.
    *
    * Scale shape (100 TB): list build + encode are one corpus scan
    * each (offline in production); the query join shuffles on list id
    * so each list is an independent block, and the per-candidate work
    * is the m-step primitive lookup fold — no D-dim arithmetic
    * anywhere on the query path.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nlist: Int = 8, nprobe: Int = 2, m: Int = 8, ksub: Int = 16,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = corpus.filter(col(idCol) < nlist)
      .select(col(idCol).as("cid"), col(vecCol).as("c_centroid"))
    val cb = pqCodebooks(corpus, m, ksub, idCol, vecCol)
    val lists = ivfAssign(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
        centroids, "neighbor_id", "c_vec", keep = 1)
      .select(col("neighbor_id"), col("cid"))
      .join(pqEncode(corpus, cb, idCol, vecCol)
        .select(col(idCol).as("neighbor_id"), col("packed")), Seq("neighbor_id"))
    val n2flat = cb.flatMap(_.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    })
    val probes = ivfAssign(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
        centroids, "query_id", "q_vec", keep = nprobe)
      .withColumn("q_vec", asDouble(col("q_vec")))
      .withColumn("lut", call_function("pq_lut", col("q_vec"),
        typedLit(cb.map(_.map(_.toIndexedSeq)))))
      .withColumn("q_norm", norm(col("q_vec")))
      .select(col("query_id"), col("cid"), col("lut"), col("q_norm"))
    val scored = lists.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        call_function("pq_adc_score", col("packed"), col("lut"), col("q_norm"),
          typedLit(n2flat), lit(ksub)).as("score"))
    LatestPerKey.topKRanked(scored, k, Seq(col("query_id")),
        Seq(col("score").desc_nulls_last, col("neighbor_id").asc_nulls_first))
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
  }

  /** Near-duplicate vector pairs: BANDED hyperplane-LSH candidates, then
    * exact cosine ≥ threshold — the same banding-for-recall shape as the
    * minhash/simhash dedups (a pair is a candidate when ANY band's bits
    * all agree, so one flipped hyperplane no longer hides a ~cos-0.95
    * pair the way a single full-width signature did).
    *
    * Scale shape (100 TB): explode to (band, member) → one groupBy(band)
    * shuffle → in-bucket pair expansion, with `Buckets.boundedMembers`
    * dropping degenerate buckets (> cap members) so no task ever expands
    * an unbounded |B|² pair list — this replaces the old self-join on a
    * 2^nBits-key bucket column (≤256-way parallelism, quadratic in-task
    * expansion, signature pipeline computed twice). Parallelism is now
    * bands × 2^rowsPerBand buckets and bounded ≤ cap²/2 pairs per task.
    * Oracles must apply the identical banding + count cap.
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double, nBits: Int = 16,
                   bands: Int = 4,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(bands > 0 && nBits % bands == 0, "nearDupPairs: bands must divide nBits")
    // fan the hyperplane-signature stage out to cluster width (r16):
    // single-split bench scans ran it on one core; no-op at scale
    val banded = FanOut.widen(
        vectors.select(col(idCol).as("id"), col(vecCol).as("vec")))
      .select(col("id"), col("vec"),
        explode(hyperplaneBands(col("vec"), bands, nBits / bands)).as("band"))
    Buckets.boundedMembers(banded, col("band"), struct(col("id"), col("vec")))
      .select(explode(expr(
        """flatten(transform(members, a ->
          |  transform(filter(members, b -> b.id > a.id),
          |    b -> struct(a.id AS id_1, b.id AS id_2,
          |                cosine_sim(a.vec, b.vec) AS cos))))""".stripMargin)).as("p"))
      .select(col("p.id_1").as("id_1"), col("p.id_2").as("id_2"), col("p.cos").as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
      .select(col("id_1"), col("id_2"), round(col("cos"), 6).as("cosine"))
  }
}
