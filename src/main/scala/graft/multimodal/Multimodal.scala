package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * The Spark-side shape is real and tested — a `BinaryType` payload
  * column processed in executor batches via `mapPartitions` over a typed
  * Dataset (one decoder instance per partition, bytes never touch the
  * driver) producing a typed metadata row. The DECODE ITSELF IS A STUB:
  * this container has no image/audio codecs, so `decodeStub` derives
  * deterministic fake dimensions from an md5 of the payload bytes. A
  * real deployment swaps `decodeStub` for a codec call; nothing else
  * changes — schema, partitioning, batch shape are production-real.
  *
  * The test corpus has no binary media, so `documents.text` bytes stand
  * in as the payload (UTF-8, so DuckDB's md5(text) sees the same bytes
  * and the oracle can replicate the fake decode arithmetic exactly).
  *
  * Frame sampling: a stride-2 sample over the fake frame count, the
  * usual decimation shape for video feature extraction.
  */
object Multimodal {

  case class MediaBlob(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
                       height: Long, n_frames: Long, n_sampled: Long,
                       resized_w: Long, resized_h: Long)

  /** Aspect-preserving fit into TargetDim×TargetDim (the resize step of
    * an image pipeline) — pure integer math so the oracle reproduces it
    * exactly; the actual pixel resampling belongs to the stubbed codec. */
  val TargetDim = 224L

  def resizeFit(w: Long, h: Long): (Long, Long) =
    if (w >= h) (TargetDim, math.max(1L, h * TargetDim / w))
    else (math.max(1L, w * TargetDim / h), TargetDim)

  /** STUB decoder: deterministic pseudo-metadata from the payload md5.
    * Replace with a real codec for production use. */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    val hex = MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val width = 64L + h % 1857L
    val height = 64L + (h >> 12) % 1017L
    val frames = 1L + (h >> 24) % 16L
    (width, height, frames)
  }

  /** Binary payload table: doc_id + the bytes. In production this is
    * `spark.read.format("binaryFile")` or a parquet BinaryType column. */
  def blobs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Decode + frame-sample metadata, one decoder per partition. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    blobs(spark, dir).as[MediaBlob].mapPartitions { it =>
      it.map { b =>
        val (w, h, frames) = decodeStub(b.payload)
        val (rw, rh) = resizeFit(w, h)
        MediaMeta(b.doc_id, b.payload.length.toLong, w, h,
          frames, (frames + 1) / 2, rw, rh)
      }
    }.toDF()
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, frame_hash: Long)

  /** Frame sampling + per-frame feature extraction: every STRIDE-th
    * frame of the fake decode, with a deterministic per-frame content
    * hash (stand-in for a per-frame embedding/feature call). The
    * explode happens in the executor batch loop — frames of one
    * payload never leave their partition before the feature step. */
  val FrameStride = 2

  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    blobs(spark, dir).as[MediaBlob].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { b =>
        val (_, _, frames) = decodeStub(b.payload)
        (0L until frames by FrameStride).map { idx =>
          md.reset()
          md.update(b.payload)
          md.update(s"#$idx".getBytes("UTF-8"))
          val hex = md.digest().map("%02x".format(_)).mkString
          FrameRow(b.doc_id, idx, java.lang.Long.parseLong(hex.substring(0, 15), 16))
        }
      }
    }.toDF()
  }

  /** Materialize each document's payload as a real on-disk file, once
    * per CORPUS — written from EXECUTORS via foreachPartition so bytes
    * never pass through the driver (local[k] shares one filesystem; on
    * a cluster this path would be shared/object storage). The
    * directory is keyed by a corpus fingerprint (row count + summed
    * text crc32), not just the input path: regenerated fixture data at
    * the same path gets a fresh directory instead of stale files, and
    * a shrunk corpus cannot leave orphaned extra files in view.
    * Idempotent: a marker file skips the write on reruns; concurrent
    * writers race benignly (identical bytes). */
  def binaryFileDir(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val (nDocs, fp) = Tables.load(spark, dir, "documents")
      .agg(count(lit(1)), sum(crc32(col("text"))))
      .as[(Long, Long)].head()
    val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_binary_${key}_${nDocs}_$fp")
    val marker = new java.io.File(out, "_WRITTEN")
    if (!marker.exists()) {
      out.mkdirs()
      val outPath = out.getAbsolutePath
      blobs(spark, dir).as[MediaBlob].foreachPartition {
        (it: Iterator[MediaBlob]) =>
          it.foreach { b =>
            java.nio.file.Files.write(
              new java.io.File(outPath, f"doc_${b.doc_id}%08d.bin").toPath,
              b.payload)
          }
      }
      marker.createNewFile()
    }
    out.getAbsolutePath
  }

  /** The REAL binary-media source: `spark.read.format("binaryFile")`
    * over actual files (the round-1 gap), feeding the identical decode
    * pipeline as [[multimodalMeta]] — so the oracle is unchanged. The
    * source carries (path, modificationTime, length, content) with
    * pushdown on path/length; doc_id is recovered from the file name.
    * At scale, `spark.sql.sources.binaryFile.maxLength` guards against
    * oversized payloads and `pathGlobFilter` prunes at listing time. */
  def multimodalBinaryFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(binaryFileDir(spark, dir))
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        col("content").as("payload"))
      .as[MediaBlob].mapPartitions { it =>
        it.map { b =>
          val (w, h, frames) = decodeStub(b.payload)
          val (rw, rh) = resizeFit(w, h)
          MediaMeta(b.doc_id, b.payload.length.toLong, w, h,
            frames, (frames + 1) / 2, rw, rh)
        }
      }.toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_binary_source" -> (multimodalBinaryFiles _))

  val oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id, byte_len, width, height, n_frames,
        |       (n_frames + 1) // 2 AS n_sampled,
        |       CASE WHEN width >= height THEN 224
        |            ELSE greatest(1, width * 224 // height) END AS resized_w,
        |       CASE WHEN width >= height THEN greatest(1, height * 224 // width)
        |            ELSE 224 END AS resized_h
        |FROM (SELECT doc_id, strlen(text) AS byte_len,
        |             64 + h % 1857 AS width,
        |             64 + (h >> 12) % 1017 AS height,
        |             1 + (h >> 24) % 16 AS n_frames
        |      FROM (SELECT doc_id, text,
        |                   CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
        |            FROM documents))""".stripMargin,
    // same arithmetic as multimodal_meta: the binary-source query reads
    // the identical bytes back from real files
    "multimodal_binary_source" ->
      """SELECT doc_id, byte_len, width, height, n_frames,
        |       (n_frames + 1) // 2 AS n_sampled,
        |       CASE WHEN width >= height THEN 224
        |            ELSE greatest(1, width * 224 // height) END AS resized_w,
        |       CASE WHEN width >= height THEN greatest(1, height * 224 // width)
        |            ELSE 224 END AS resized_h
        |FROM (SELECT doc_id, strlen(text) AS byte_len,
        |             64 + h % 1857 AS width,
        |             64 + (h >> 12) % 1017 AS height,
        |             1 + (h >> 24) % 16 AS n_frames
        |      FROM (SELECT doc_id, text,
        |                   CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
        |            FROM documents))""".stripMargin,
    "multimodal_frames" ->
      """WITH meta AS (
        |  SELECT doc_id, text,
        |         1 + (CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) >> 24) % 16 AS n_frames
        |  FROM documents)
        |SELECT doc_id, idx AS frame_idx,
        |       CAST(('0x' || substring(md5(text || '#' || idx), 1, 15)) AS BIGINT) AS frame_hash
        |FROM meta, LATERAL unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 2)) t(idx)""".stripMargin)
}
