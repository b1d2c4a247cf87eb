package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.operators.{Similarity, VectorIndex}

/** q304: the streaming EMBEDDING admission gate — the vector tier's
  * analog of q217's banded text gate, completing online/offline parity
  * for BOTH dedup families (text: q206 batch / q211 index / q217
  * stream; vectors: q30 batch anchor / q294 index / THIS stream).
  * Arriving vectors are checked for semantic near-duplication (the q30
  * predicate, cosine ≥ 0.45) against the PERSISTED IVF index of the
  * standing corpus before admission: each arrival is assigned its
  * `nprobe = 2` nearest cells under the FROZEN persisted model (q294's
  * serving default — q303 is the curve that justifies it) and joins
  * only those cells' indexed vectors.
  *
  * Plan shape per micro-batch, and why it is STATELESS where q217
  * needs dedup state: the persisted centroids load ONCE as a k×dim
  * literal before the stream starts (model state — the q260 contract),
  * so cell assignment is a narrow codegen map: dists against the
  * literal, `array_sort` of (dist, cid) structs — lexicographic order
  * IS the (9-rounded distance, lowest-cid) tie-break — then the first
  * two cids explode into probe rows. The STREAM-STATIC equi-join on
  * `cid` meets the index table; because the index assigns every corpus
  * vector to exactly ONE cell (its partition), a (new, old) pair can
  * surface through at most one probed cell — no duplicate candidates,
  * hence no `dropDuplicates` state at all. Gate state is ZERO rows
  * regardless of corpus size or stream length; candidate volume per
  * arrival is nprobe/k of the corpus, the index side's partition
  * pruning carries to the static join (the join key is the partition
  * column), and only arrivals flow through the stream.
  *
  * Approximate BY DESIGN exactly like the serving probe: a near-dup
  * whose indexed twin lives outside the arrival's two nearest cells
  * passes the gate (measured against the exact q30 relation the same
  * way q303 measures probe recall). The oracle mirrors the frozen
  * model, the 2-cell probe and the threshold, so the emitted pair set
  * is hash-checked. Emits one row per (arriving, indexed) near-dup
  * pair: the REJECT log with its witness, `vec_new, vec_dup, cosine`.
  */
object StreamVectorGate {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def q304StreamIvfGate(spark: SparkSession, dir: String): DataFrame =
    gate(spark, dir)._1

  /** The gate plus the total state rows its streaming query held —
    * asserted ZERO by VectorIndexSpec (the statelessness contract the
    * scaladoc above argues from the one-cell-per-vector invariant). */
  private[graft] def gate(spark: SparkSession, dir: String): (DataFrame, Long) =
    StreamingWindows.withStreamPartitions(spark) {
      val isNew = F.col("vec_id") % 10 === 7
      // the standing artifact: base corpus only, frozen model
      VectorIndex.buildIvf(spark,
        Similarity.embDouble(spark, dir).filter(!isNew), 8,
        "graft_ivf_gate_cent", "graft_ivf_gate_idx")
      val centers = VectorIndex.readCenters(spark, "graft_ivf_gate_cent", 8)
      val index = spark.table("graft_ivf_gate_idx")

      val arrivals = spark.readStream
        .schema(embSchema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(dir)
        .filter(isNew)
        .select(F.col("vec_id").as("vec_new"),
          F.transform(F.col("embedding"), x => x.cast("double")).as("nv"))
      // nprobe=2 cell assignment under the frozen model, as a narrow
      // codegen map: (dist, cid) structs sort lexicographically =
      // (9-rounded distance, lowest cid) — lloydAssign's tie-break
      val probed = arrivals
        .withColumn("ranked", F.array_sort(
          F.zip_with(
            F.typedlit(centers),
            F.typedlit(centers.indices.toList),
            (c, i) => F.struct(
              F.round(Similarity.sqDist(F.col("nv"), c), 9).as("d"),
              i.as("cid")))))
        .select(F.col("vec_new"), F.col("nv"),
          F.explode(F.array(
            F.col("ranked").getItem(0).getField("cid"),
            F.col("ranked").getItem(1).getField("cid"))).as("cid"))
      val rejected = probed
        .join(index, Seq("cid")) // stream-static, on the partition key
        .select(F.col("vec_new"), F.col("vec_id").as("vec_dup"),
          F.round(Similarity.dotD(F.col("nv"), F.col("v")) /
            (Similarity.normD(F.col("nv")) * Similarity.normD(F.col("v"))),
            9).as("cosine"))
        .filter(F.col("cosine") >= 0.45)

      val name = "graft_stream_vgate_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val query = rejected.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
      val stateRows = query.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsTotal).sum
      val result = spark.table(name).orderBy("vec_new", "vec_dup")
      (StreamingWindows.materializeAndDrop(spark, name, result), stateRows)
    }
}
