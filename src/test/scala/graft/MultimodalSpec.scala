package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.{MediaRecord, Multimodal, StubDecoder}

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("media table carries binary payloads with typed metadata") {
    val df = Multimodal.mediaTable(spark, sf)
    assert(df.schema("payload").dataType.typeName == "binary")
    val row = df.orderBy("doc_id").head()
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[Int]("n_bytes") > 0)
    assert(meta.getAs[Int]("width") >= 320)
    assert(meta.getAs[Int]("height") >= 240)
  }

  test("metadata query prunes the payload column from the scan") {
    val plan = Multimodal.q43MultimodalMeta(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("payload"), plan.take(2000))
  }

  test("stub decoder batches bound memory and decode deterministically") {
    val records = (1L to 150L).iterator.map(i =>
      MediaRecord(i, "image", Array.fill((i % 5).toInt + 1)(i.toByte)))
    val feats = StubDecoder.decodeBatches(records, batchSize = 64).toSeq
    assert(feats.length == 150)
    val f1 = feats.find(_.doc_id == 1L).get
    assert(f1.n_bytes == 2 && f1.n_frames == 1 && f1.mean_byte == 1.0)
  }

  test("feature aggregation covers every modality with sane bounds") {
    val rows = Multimodal.q44MediaFeatures(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_assets") > 0)
      val lo = r.getAs[Double]("min_mean_byte")
      val hi = r.getAs[Double]("max_mean_byte")
      assert(lo > 0 && hi < 256 && lo <= hi)
    }
  }

  test("frame sampling and resize stubs keep the batch contract") {
    val payload = Array.tabulate(10000)(_.toByte)
    val frames = StubDecoder.frameSample(payload, frameBytes = 100, stride = 2)
    assert(frames.length <= 64)
    assert(frames == frames.sorted && frames.distinct == frames)
    assert(frames.forall(o => o >= 0 && o < payload.length))
    val half = StubDecoder.resizeHalf(payload)
    assert(half.length == payload.length / 2)
    assert(half(1) == payload(2)) // every other byte retained
  }

  test("perceptual banding returns exactly the brute-force hamming<=7 pairs") {
    // the pigeonhole guarantee made checkable: 8 chunks over 126 bits
    // means a pair within hamming 7 MUST share a chunk, so the banded
    // join loses nothing vs all-pairs — this is what lets q214 carry a
    // brute-force oracle while shipping a bucket-bounded plan
    import spark.implicits._
    val hashes = Multimodal.perceptualHashes(spark, sf).collect()
    val brute = (for {
      a <- hashes; b <- hashes if a.doc_id < b.doc_id
      ham = java.lang.Long.bitCount(a.h_lo ^ b.h_lo) +
        java.lang.Long.bitCount(a.h_hi ^ b.h_hi)
      if ham <= 7
    } yield (a.doc_id, b.doc_id, ham)).toSet
    val banded = Multimodal.q214MediaPhash(spark, sf).as[(Long, Long, Int)]
      .collect().toSet
    assert(banded == brute)
    assert(brute.nonEmpty) // the fixture's near-dups must surface
  }

  test("perceptual near-dup plan joins on chunk keys, never all-pairs") {
    val plan = Multimodal.q214MediaPhash(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("media tier agrees with the MinHash tier on this corpus") {
    // independent signals (byte-gram histogram vs word-shingle MinHash)
    // landing on the same 25 pairs is the cross-modality consistency a
    // curation pipeline leans on; a histogram regression that loses
    // recall or invents pairs breaks set equality here
    import spark.implicits._
    val media = Multimodal.q214MediaPhash(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val minhash = operators.Dedup.q25DedupMinhash(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(media == minhash)
  }

  test("mean byte equals the ascii average of the source text") {
    // documents are ascii word-salad: payload bytes == text chars, so
    // the decoded feature is checkable from the text itself
    import spark.implicits._
    val doc = Tables.documents(spark, sf).orderBy("doc_id").head()
    val text = doc.getAs[String]("text")
    val expected = text.getBytes("UTF-8")
      .foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / text.length
    val media = Multimodal.mediaTable(spark, sf)
      .filter(col("doc_id") === doc.getAs[Long]("doc_id"))
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaRecord]
    val got = StubDecoder
      .decodeBatches(media.collect().iterator, 8).next().mean_byte
    assert(got == expected)
  }
}
