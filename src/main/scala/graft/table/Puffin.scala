package graft.table

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** Iceberg Puffin statistics-file container (spec "Puffin file format"):
  *
  * {{{
  *   Magic | Blob₁ … Blobₙ | Magic FooterPayload FooterPayloadSize Flags Magic
  * }}}
  *
  * Magic = bytes 0x50 0x46 0x41 0x31 ("PFA1"); FooterPayloadSize is a
  * 4-byte little-endian int; Flags is 4 bytes (bit 0 of byte 0 = footer
  * payload compressed — never set here, payloads and footer are written
  * uncompressed). The footer payload is JSON: a `blobs` list with each
  * blob's `type`, `fields`, `snapshot-id`, `sequence-number`, `offset`,
  * `length`, and free-form `properties` (the `ndv` property is the one
  * stats readers consume), plus file-level `properties`.
  *
  * This is the statistics vehicle of the declared stack (Iceberg 1.9.1
  * writes theta sketches through it; reference `README.md:36`): the
  * `statistics` field of exported table metadata points at one of these
  * files, giving foreign engines NDV estimates for CBO without scanning. */
object Puffin {

  val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte)
  val ThetaBlobType = "apache-datasketches-theta-v1"

  case class Blob(
      blobType: String,
      fields: Seq[Int], // Iceberg field ids the blob describes
      snapshotId: Long,
      sequenceNumber: Long,
      payload: Array[Byte],
      properties: Map[String, String])

  private implicit val fmts: Formats = DefaultFormats

  /** Serialize a Puffin file. Returns (bytes, footerSizeInBytes) — the
    * footer size is what table metadata's `file-footer-size-in-bytes`
    * records so readers can fetch the footer with one ranged read. */
  def write(blobs: Seq[Blob], fileProperties: Map[String, String]): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val metas = blobs.map { b =>
      val offset = out.size()
      out.write(b.payload)
      (("type" -> b.blobType) ~
        ("fields" -> b.fields.toList) ~
        ("snapshot-id" -> b.snapshotId) ~
        ("sequence-number" -> b.sequenceNumber) ~
        ("offset" -> offset.toLong) ~
        ("length" -> b.payload.length.toLong) ~
        ("properties" -> b.properties)): JValue
    }
    val payloadJson: JValue =
      ("blobs" -> JArray(metas.toList)) ~ ("properties" -> fileProperties)
    val payload = JsonMethods.compact(JsonMethods.render(payloadJson)).getBytes(UTF_8)
    val footerStart = out.size()
    out.write(Magic)
    out.write(payload)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(payload.length).array())
    out.write(Array[Byte](0, 0, 0, 0)) // flags: footer payload uncompressed
    out.write(Magic)
    (out.toByteArray, out.size() - footerStart)
  }

  case class BlobMeta(blobType: String, fields: Seq[Int], snapshotId: Long,
      sequenceNumber: Long, offset: Long, length: Long,
      properties: Map[String, String])

  /** Independent reader: validates both magics and the footer structure,
    * returns the blob metadata plus a payload accessor. */
  def read(bytes: Array[Byte]): (Seq[BlobMeta], Map[String, String], BlobMeta => Array[Byte]) = {
    require(bytes.length >= 20, "truncated puffin file")
    require(bytes.slice(0, 4).sameElements(Magic), "missing leading magic")
    require(bytes.slice(bytes.length - 4, bytes.length).sameElements(Magic),
      "missing trailing magic")
    val flags = bytes.slice(bytes.length - 8, bytes.length - 4)
    require((flags(0) & 1) == 0, "compressed footer payload not supported")
    val payloadSize = ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    val payloadStart = bytes.length - 12 - payloadSize
    require(bytes.slice(payloadStart - 4, payloadStart).sameElements(Magic),
      "missing footer-start magic")
    val json = JsonMethods.parse(
      new String(bytes, payloadStart, payloadSize, UTF_8))
    val blobs = (json \ "blobs").children.map { b =>
      BlobMeta(
        (b \ "type").extract[String],
        (b \ "fields").extract[Seq[Int]],
        (b \ "snapshot-id").extract[Long],
        (b \ "sequence-number").extract[Long],
        (b \ "offset").extract[Long],
        (b \ "length").extract[Long],
        (b \ "properties").extractOpt[Map[String, String]].getOrElse(Map.empty))
    }
    val fileProps = (json \ "properties").extractOpt[Map[String, String]]
      .getOrElse(Map.empty)
    (blobs, fileProps,
      m => bytes.slice(m.offset.toInt, (m.offset + m.length).toInt))
  }
}
