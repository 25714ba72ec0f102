package graft.format

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Per-file BLOOM FILTER primitives for the metadata skipping index — the
  * Hudi bloom-index / metadata-table-bloom analog, AND-composed with
  * min/max range skipping and bucket pruning (each independently
  * conservative).
  *
  * Why: min/max ranges go blind on high-cardinality columns whose values
  * interleave across files (every file spans the whole domain), and bucket
  * pruning only serves the RECORD KEY. A bloom over a declared payload
  * column answers `value ∉ file` definitively (no false negatives), so an
  * equality/IN lookup drops files at PLANNING time — before any footer
  * read — with false positives only costing a kept file.
  *
  * Layout: `payload[0] = k` (hash count), `payload[1..] = bitset`;
  * stored in commit JSON as base64(DEFLATE(payload)) — a sparse bitset
  * (few distinct values per file) deflates to a fraction of its raw size.
  * Values are hashed through their Spark CAST-to-string rendering with
  * seeded xxhash64 — the same canonical form min/max stats store and the
  * same hash family the bucket index pins driver/executor-bit-identical.
  *
  * Sizing: `DefaultBits` = 2^17 (16 KiB raw) holds ~18k distinct values
  * per file at k=5 under 1% false-positive rate; size via `bloomBits` to
  * ~7× the expected per-file distinct count. An UNDERSIZED bloom degrades
  * to keeping files (false positives), never to wrong results.
  */
object Bloom {
  val DefaultBits: Int = 1 << 17
  val DefaultHashes: Int = 5

  /** Fresh k-prefixed bitset payload. */
  def empty(bits: Int, k: Int): Array[Byte] = {
    require(bits >= 8 && (bits & 7) == 0, s"bloom bits must be a multiple of 8, got $bits")
    require(k >= 1 && k <= 127, s"bloom hash count must be in [1,127], got $k")
    val a = new Array[Byte](1 + bits / 8)
    a(0) = k.toByte
    a
  }

  private def bitIndex(v: UTF8String, seed: Int, bits: Int): Int = {
    val h = XxHash64Function.hash(v, StringType, seed.toLong)
    (((h % bits) + bits) % bits).toInt
  }

  /** Set `v`'s k bits in a k-prefixed payload. */
  def add(payload: Array[Byte], v: UTF8String): Unit = {
    val k = payload(0).toInt
    val bits = (payload.length - 1) * 8
    var i = 0
    while (i < k) {
      val b = bitIndex(v, i, bits)
      payload(1 + (b >> 3)) = (payload(1 + (b >> 3)) | (1 << (b & 7))).toByte
      i += 1
    }
  }

  /** Definitive-negative membership test against a k-prefixed payload. */
  def mightContain(payload: Array[Byte], v: UTF8String): Boolean = {
    val k = payload(0).toInt
    val bits = (payload.length - 1) * 8
    var i = 0
    while (i < k) {
      val b = bitIndex(v, i, bits)
      if ((payload(1 + (b >> 3)) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Merge (bitwise OR) `src` into `dst`; k bytes must agree. */
  def merge(dst: Array[Byte], src: Array[Byte]): Array[Byte] = {
    require(dst.length == src.length && dst(0) == src(0),
      "cannot merge blooms of different geometry")
    var i = 1
    while (i < dst.length) { dst(i) = (dst(i) | src(i)).toByte; i += 1 }
    dst
  }

  /** base64(DEFLATE(payload)) for commit-JSON storage. */
  def encode(payload: Array[Byte]): String = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    d.setInput(payload); d.finish()
    val out = new java.io.ByteArrayOutputStream(payload.length / 4)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    java.util.Base64.getEncoder.encodeToString(out.toByteArray)
  }

  /** Inverse of [[encode]]; None on any corruption (skipping stays
    * conservative — a bloom that fails to decode prunes nothing). */
  def decode(s: String): Option[Array[Byte]] =
    try {
      val comp = java.util.Base64.getDecoder.decode(s)
      val inf = new java.util.zip.Inflater()
      inf.setInput(comp)
      val out = new java.io.ByteArrayOutputStream(comp.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw new java.io.EOFException()
        out.write(buf, 0, n)
      }
      inf.end()
      val payload = out.toByteArray
      if (payload.length >= 2 && payload(0) >= 1) Some(payload) else None
    } catch { case scala.util.control.NonFatal(_) => None }
}
