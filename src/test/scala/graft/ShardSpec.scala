package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Curation

/** Shard-manifest invariants beyond the q_pack_shards oracle: size
  * bounds (a contiguous packed stream fills every shard but the last),
  * manifest-vs-placement totals, the write-then-manifest ordering, and
  * content-hash sensitivity to a flipped piece.
  */
class ShardSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def encoded = {
    import spark.implicits._
    (0L until 60L)
      .map(i => (i, 0L, (0L until (3 + i % 4)).map(j => i * 10 + j)))
      .toDF("doc_id", "tok_pos", "piece_ids")
  }

  private def packed = Curation.packTokenIds(encoded, "doc_id",
    chunkTokens = 8, bucketSize = 16, sepId = Some(999L))

  test("shard size bounds: every shard but the last is full") {
    val m = Curation.shardManifest(packed, "doc_id", chunksPerShard = 4)
      .orderBy("shard_id").collect()
    val lastShard = m.last.getAs[Long]("shard_id")
    m.foreach { r =>
      assert(r.getAs[Long]("n_chunks") <= 4)
      assert(r.getAs[Long]("n_pieces") <= 4 * 8)
      // the packed stream is contiguous, so only the LAST shard (which
      // holds the stream's possibly-partial tail chunk) may be short
      if (r.getAs[Long]("shard_id") != lastShard) {
        assert(r.getAs[Long]("n_chunks") == 4)
        assert(r.getAs[Long]("n_pieces") == 4 * 8)
      }
    }
    // shard ids are the dense prefix 0..max (no gaps in a contiguous
    // stream's chunk → shard image)
    assert(m.map(_.getAs[Long]("shard_id")).toSeq ==
      (0L to lastShard).toSeq)
  }

  test("manifest totals equal placement totals") {
    val p = packed.cache()
    try {
      val m = Curation.shardManifest(p, "doc_id", chunksPerShard = 4)
        .agg(sum("n_chunks"), sum("n_pieces")).collect()(0)
      assert(m.getLong(0) ==
        p.select(count_distinct(col("chunk_id"))).collect()(0).getLong(0))
      assert(m.getLong(1) == p.count())
    } finally p.unpersist()
  }

  test("writeShards: manifest-last ordering, read-back recount matches") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-shards").toString
    val written = Curation.writeShards(packed, "doc_id",
      chunksPerShard = 4, dir)
    // the manifest certifies the data on disk: recomputing it from the
    // written shard rows reproduces every column
    val recount = Curation.shardManifest(
      spark.read.parquet(s"$dir/shards"), "doc_id", chunksPerShard = 4)
    assert(written.orderBy("shard_id").collect().toSeq ==
      recount.select(written.columns.map(col): _*)
        .orderBy("shard_id").collect().toSeq)
    // partition layout: one directory per shard
    val shardDirs = new java.io.File(s"$dir/shards").listFiles()
      .filter(_.getName.startsWith("shard_id=")).length
    assert(shardDirs == written.count())
  }

  test("content hash changes when one piece id flips") {
    val p = packed.cache()
    try {
      val base = Curation.shardManifest(p, "doc_id", chunksPerShard = 4)
      val flipped = Curation.shardManifest(
        p.withColumn("piece_id",
          when(col("chunk_id") === 0 && col("pos") === 0,
            col("piece_id") + 1).otherwise(col("piece_id"))),
        "doc_id", chunksPerShard = 4)
      val j = base.as("a").join(flipped.as("b"), Seq("shard_id"))
        .select(col("shard_id"),
          (col("a.content_hash") === col("b.content_hash"))
            .as("same")).collect()
      assert(j.count(!_.getAs[Boolean]("same")) == 1)
      assert(j.filter(!_.getAs[Boolean]("same"))
        .map(_.getAs[Long]("shard_id")).toSeq == Seq(0L))
    } finally p.unpersist()
  }
}
