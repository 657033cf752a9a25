package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (`Array[Float]` vectors):
  * brute-force cosine top-k as the exact baseline, all-pairs top similarity,
  * and SRP-LSH bucketed ANN as the scale path.
  *
  * Scale design: the brute-force scan is the *correct* plan up to ~10⁷
  * corpus vectors per query batch (one pass, codegen'd arithmetic, no
  * shuffle; the query vector is a plan literal, i.e. broadcast for free).
  * Beyond that, s3's signature-bucket join bounds candidates per probe;
  * the signature is computed from deterministic hash-derived hyperplanes,
  * so there is no model state to broadcast at all.
  */
object Similarity {

  /** Driver-side lookup of one embedding to use as the query point —
    * becomes an array literal in the plan (implicit broadcast).
    */
  private def queryVec(s: SparkSession, dir: String, id: Long): Array[Double] =
    Tables.embeddings(s, dir).filter(col("vec_id") === id)
      .select(transform(col("embedding"), x => x.cast("double")))
      .head().getSeq[Double](0).toArray

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact k-NN: cosine of every corpus vector against the query literal,
    // top-10. One scan + TakeOrderedAndProject; no shuffle, no broadcast
    // exchange (the vector is folded into the plan).
    "s1_knn_brute" -> ((s, dir) => {
      val q = typedlit(queryVec(s, dir, 0L).toSeq)
      Tables.embeddings(s, dir)
        .filter(col("vec_id") =!= 0L)
        .select(col("vec_id"), cosine(col("embedding"), q).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    }),

    // All-pairs top-20 by cosine, blocked i<j by label band to show the
    // blocked-pair shape (label is a coarse cluster id). Exact; the
    // quadratic block scan is the oracle for s3's ANN recall.
    // Vectors are L2-normalized once (persisted) so the pair stage is a
    // single 64-wide dot product — not dot + two norms recomputed per pair.
    "s2_top_pairs" -> ((s, dir) => {
      val e = Tables.spread(Tables.embeddings(s, dir))
        .select(col("vec_id"), col("label"),
          normalized(col("embedding")).as("unit"))
        .persist()
      val a = e.alias("a")
      val b = e.alias("b")
      a.join(b, col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
          dot(col("a.unit"), col("b.unit")).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("i"), col("j"))
        .limit(20)
    }),

    // SRP-LSH ANN: 8 hash tables × 4-bit random-hyperplane bands (from one
    // 32-bit signature); candidate pairs collide in ≥1 table, then exact
    // cosine re-rank, top-10. Candidates scale with bucket occupancy, not
    // corpus² — the 100 TB path. Band width tunes recall vs cost:
    // P(candidate) = 1-(1-p^4)^8 with p = 1 - angle/π (≈0.83 at cos 0.5).
    // No oracle (hash-derived hyperplanes); DedupSimilaritySpec asserts
    // recall vs s2's exact pairs.
    "s3_ann_srp" -> ((s, dir) => {
      // persist: the 32-hyperplane signature and the unit vector are
      // computed once per vector, never inside the bucket join
      val base = Tables.spread(Tables.embeddings(s, dir))
        .select(col("vec_id"),
          normalized(col("embedding")).as("unit"),
          srpSignature(col("embedding"), nBits = 32).as("sig"))
        .persist()
      // 4-bit slice per table: (sig >> 4t) & 0xF
      val keyed = base.select(col("vec_id"),
        explode(graft.functions.HashFunctions.longBands(
          col("sig"), bands = 8, bitsPerBand = 4)).as("tb"))
      val a = keyed.alias("a")
      val b = keyed.alias("b")
      val pairs = a.join(b, col("a.tb") === col("b.tb") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
        .distinct()
      pairs
        .join(base.select(col("vec_id").as("i"), col("unit").as("u_i")), "i")
        .join(base.select(col("vec_id").as("j"), col("unit").as("u_j")), "j")
        .select(col("i"), col("j"), dot(col("u_i"), col("u_j")).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("i"), col("j"))
        .limit(10)
    }),

    // IVF-flat ANN: coarse quantizer = every 53rd vector as a centroid
    // (deterministic stand-in for trained k-means — the Spark plumbing is
    // identical); vectors assign to their nearest centroid (broadcast
    // centroid join), the query probes its nprobe=4 nearest cells and
    // exact-ranks only those cells' vectors. At 100 TB the assignment is
    // one broadcast join + write partitioned by cell; a probe then reads
    // nprobe partitions instead of the corpus. No oracle (probe subset);
    // DedupSimilaritySpec asserts recall vs s1's exact top-10.
    "s4_ivf_knn" -> ((s, dir) => {
      val e = Tables.spread(Tables.embeddings(s, dir))
        .select(col("vec_id"), normalized(col("embedding")).as("unit"))
        .persist()
      val cents = e.filter(col("vec_id") % 53 === 0)
        .select(col("vec_id").as("cent_id"), col("unit").as("cent"))
      // assign every vector to its nearest centroid
      val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cent_id"))
      val assigned = e.join(broadcast(cents))
        .withColumn("sim", dot(col("unit"), col("cent")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cent_id"), col("unit"))
        .persist()
      // query = vec 0; probe its 4 nearest centroids
      val qUnit = typedlit(
        assigned.filter(col("vec_id") === 0L).select("unit")
          .head().getSeq[Double](0))
      val probed = cents
        .withColumn("qsim", dot(col("cent"), qUnit))
        .orderBy(col("qsim").desc, col("cent_id"))
        .limit(4)
        .select("cent_id")
      assigned.join(broadcast(probed), "cent_id")
        .filter(col("vec_id") =!= 0L)
        .select(col("vec_id"), dot(col("unit"), qUnit).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    })
  )

  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
      s"(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) * " +
      s"sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[])))"

  val oracleSql: Map[String, String] = Map(
    "s1_knn_brute" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, ${cosSql("embedding", "qe")} AS cos_sim
         |FROM embeddings, q
         |WHERE vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id
         |LIMIT 10""".stripMargin,

    "s2_top_pairs" ->
      s"""SELECT a.vec_id AS i, b.vec_id AS j,
         |  ${cosSql("a.embedding", "b.embedding")} AS cos_sim
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |ORDER BY cos_sim DESC, i, j
         |LIMIT 20""".stripMargin
  )
}
