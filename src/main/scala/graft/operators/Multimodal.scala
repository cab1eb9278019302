package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages shaped the way a production pipeline runs them — batch-wise
  * `mapPartitions` over the binary payloads (the Scala analogue of
  * `mapInPandas`), so each task amortizes codec setup across its partition.
  *
  * STUB NOTE: real decoders (JPEG/PNG/audio codecs) are not available in
  * this environment, so `decodeStub` derives deterministic fake features
  * from the payload bytes. The Spark-side contract — schema, partitioning,
  * batch iteration, output shape — is real and tested; swapping the stub
  * for a codec changes only the function body marked STUB below.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  case class Asset(asset_id: Long, media: Array[Byte], format: String,
                   width: Int, height: Int)

  /** Fake per-asset features (STUB output shape = real output shape). */
  case class AssetFeatures(asset_id: Long, format: String, n_bytes: Long,
                           features: Array[Float])

  case class Frame(asset_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Build an asset table from the `documents` fixture: payload = utf-8
    * bytes, metadata derived deterministically from doc_id. */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(
        $"doc_id".as("asset_id"),
        $"text".cast("binary").as("media"),
        element_at(array(lit("jpeg"), lit("png"), lit("webp")), ($"doc_id" % 3 + 1).cast("int")).as("format"),
        (($"doc_id" % 16) * 64 + 256).cast("int").as("width"),
        (($"doc_id" % 9) * 64 + 256).cast("int").as("height"))
      .as[Asset]
  }

  /** Feature extraction, batch-wise per partition. A real implementation
    * decodes `media` and runs a vision/audio model per batch; the stub maps
    * bytes -> deterministic floats so tests can pin the plumbing. */
  def extractFeatures(assets: Dataset[Asset], dim: Int): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition setup happens once (codec/model init in real life)
      batch.map { a =>
        // STUB: deterministic fake "embedding" from payload bytes
        val feats = Array.tabulate(dim) { i =>
          val b = if (a.media.isEmpty) 0 else a.media(i % a.media.length) & 0xff
          ((b * 31 + i * 7) % 256) / 255.0f
        }
        AssetFeatures(a.asset_id, a.format, a.media.length.toLong, feats)
      }
    }
  }

  /** Resize: metadata transform + payload passthrough (STUB — a real
    * implementation re-encodes the pixels; the metadata contract is what
    * downstream stages consume). */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.map(a => a.copy(width = w, height = h))
  }

  /** Frame sampling: one row per sampled frame, bytes sliced round-robin
    * from the payload (STUB for video frame extraction; the explode shape
    * and per-frame byte slices are the real contract). */
  def frameSample(assets: Dataset[Asset], nFrames: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val chunk = math.max(a.media.length / math.max(nFrames, 1), 1)
      (0 until nFrames).iterator.map { i =>
        val from = math.min(i * chunk, a.media.length)
        val until = math.min(from + chunk, a.media.length)
        Frame(a.asset_id, i, a.media.slice(from, until))
      }
    }
  }

  /** DataFrame view with struct-typed metadata (the storage-layer schema:
    * binary payload + nested meta struct, SURVEY.md §1 nested types). */
  def assetTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    assets(spark, dir).toDF()
      .select($"asset_id", $"media",
        struct($"format", $"width", $"height").as("meta"))
  }
}
