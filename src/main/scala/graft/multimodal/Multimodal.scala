package graft.multimodal

import org.apache.spark.sql.Dataset

/** Multimodal-column plumbing (north-star ops): media as opaque binary
  * columns with typed metadata, processed partition-local in batches —
  * the Scala analog of a mapInPandas decode stage.
  *
  * The actual image/audio codecs are NOT in this container, so the decode
  * step is a clearly-marked deterministic STUB (pure function of the
  * bytes). Everything around it — the schema, the typed Dataset plumbing,
  * the partition-local batch shape, the feature contract — is real and
  * tested, and swapping `decodeStub` for a JNI/codec call changes nothing
  * else. At 100 TB this stage is embarrassingly parallel: no shuffle, one
  * task per input split, decode cost amortized per partition (any
  * per-batch model/codec init belongs in the mapPartitions prologue).
  */
object Multimodal {

  final case class MediaMeta(mediaType: String, sizeBytes: Long)
  final case class MediaRow(id: Long, bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      id: Long,
      size_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      sum64: Long,
      mean64: Double)

  /** STUB decoder — deterministic fake "decode" of an opaque media blob.
    * Pretends the first two bytes are header dims and derives a fake
    * frame count; a real build replaces this body with the codec call.
    */
  def decodeStub(bytes: Array[Byte]): (Long, Long, Long) = {
    val width = if (bytes.length > 0) (bytes(0) & 0xff).toLong else 0L
    val height = if (bytes.length > 1) (bytes(1) & 0xff).toLong else 0L
    val nFrames = bytes.length.toLong % 7
    (width, height, nFrames)
  }

  /** Feature extraction over the first 64 bytes (sign-fixed: & 0xFF —
    * numpy uint8 vs JVM signed Byte, SURVEY.md §7.5). */
  def featurize(r: MediaRow): MediaFeatures = {
    val (w, h, f) = decodeStub(r.bytes)
    val n = math.min(64, r.bytes.length)
    var sum = 0L
    var i = 0
    while (i < n) { sum += (r.bytes(i) & 0xff); i += 1 }
    MediaFeatures(r.id, r.meta.sizeBytes, w, h, f, sum,
      if (n == 0) 0.0 else sum.toDouble / n.toDouble)
  }

  /** Partition-local batch decode: the mapInPandas-shaped stage. */
  def decodeAll(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition prologue: in a real decoder, init codec here once
      it.map(featurize)
    }
  }
}
