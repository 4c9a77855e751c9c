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
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
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
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 8, nprobe: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = corpus.filter(col(idCol) < nlist)
      .select(col(idCol).as("cid"), col(vecCol).as("c_centroid"))
    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame =
      LatestPerKey.topKRanked(
        df.crossJoin(broadcast(centroids))
          .withColumn("c_score", cosine(col(vec), col("c_centroid"))),
        keep, Seq(col(id)),
        Seq(col("c_score").desc_nulls_last, col("cid").asc_nulls_first))
        .select(col(id), col(vec), col("cid"))
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
    val banded = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"),
      explode(hyperplaneBands(col(vecCol), bands, nBits / bands)).as("band"))
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
