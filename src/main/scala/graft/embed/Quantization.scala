package graft.embed

/** Storage quantization for embedding indexes — the reference's model
  * "variants" (`f32 | f16 | i8`, src/main.rs:60-62) map usearch scalar
  * quantization kinds (collection_actor.rs:793-797). Spark has no f16/i8
  * vector types, so quantization here is a '''storage''' concern (exactly
  * the survey's design stance, SURVEY §1.3): the index parquet stores a
  * compact binary payload; readers always see `array<float>`.
  *
  * Formats (per vector):
  *  - `f16`: IEEE 754 binary16, little-endian, 2 bytes/dim (round-to-
  *    nearest-even via bit manipulation — Java 17 lacks float16 intrinsics).
  *  - `i8`: symmetric per-vector scale (`max|x| / 127`), little-endian
  *    float scale header then 1 signed byte/dim.
  *
  * Both are deterministic and self-describing; de/serialization runs
  * inside codegen'd UDF calls, one allocation per vector.
  */
object Quantization {

  // ---- f16 ------------------------------------------------------------

  /** Round a float to IEEE binary16 bits (round-to-nearest-even). */
  def floatToHalfBits(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val value = bits & 0x7fffffff
    if (value >= 0x47800000) { // overflow -> inf (or NaN preserved)
      if (value > 0x7f800000) (sign | 0x7e00).toShort // NaN
      else (sign | 0x7c00).toShort
    } else if (value < 0x38800000) { // subnormal / zero
      if (value < 0x33000000) sign.toShort // underflow to zero
      else {
        val shift = 126 - (value >>> 23)
        val mant = (value & 0x7fffff) | 0x800000
        val rounded = (mant + (1 << (shift - 1)) - 1 + ((mant >>> shift) & 1)) >>> shift
        (sign | rounded).toShort
      }
    } else {
      // round-to-nearest-even: add 0xFFF plus the result's would-be LSB, so
      // an exact halfway remainder (0x1000) stays on the even neighbor
      val mant13 = value - 0x38000000
      val half = (mant13 + 0xFFF + ((mant13 >>> 13) & 1)) >>> 13
      (sign | half).toShort
    }
  }

  def halfBitsToFloat(h: Short): Float = {
    val sign = (h & 0x8000) << 16
    val exp = (h >>> 10) & 0x1f
    val mant = h & 0x3ff
    val bits =
      if (exp == 0) {
        if (mant == 0) sign
        else { // subnormal: normalize
          var m = mant
          var e = -1
          while ((m & 0x400) == 0) { m <<= 1; e += 1 }
          sign | ((127 - 15 - e) << 23) | ((m & 0x3ff) << 13)
        }
      } else if (exp == 31) sign | 0x7f800000 | (mant << 13)
      else sign | ((exp - 15 + 127) << 23) | (mant << 13)
    java.lang.Float.intBitsToFloat(bits)
  }

  def encodeF16(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](v.length * 2)
    var i = 0
    while (i < v.length) {
      val h = floatToHalfBits(v(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  def decodeF16(b: Array[Byte]): Array[Float] = {
    val out = new Array[Float](b.length / 2)
    var i = 0
    while (i < out.length) {
      val h = ((b(2 * i) & 0xff) | ((b(2 * i + 1) & 0xff) << 8)).toShort
      out(i) = halfBitsToFloat(h)
      i += 1
    }
    out
  }

  // ---- i8 -------------------------------------------------------------

  def encodeI8(v: Array[Float]): Array[Byte] = {
    var maxAbs = 0f
    var i = 0
    while (i < v.length) { val a = math.abs(v(i)); if (a > maxAbs) maxAbs = a; i += 1 }
    val scale = if (maxAbs == 0f) 1f else maxAbs / 127f
    val out = new Array[Byte](4 + v.length)
    val sb = java.lang.Float.floatToIntBits(scale)
    out(0) = (sb & 0xff).toByte; out(1) = ((sb >> 8) & 0xff).toByte
    out(2) = ((sb >> 16) & 0xff).toByte; out(3) = ((sb >> 24) & 0xff).toByte
    i = 0
    while (i < v.length) {
      out(4 + i) = math.round(v(i) / scale).max(-127).min(127).toByte
      i += 1
    }
    out
  }

  def decodeI8(b: Array[Byte]): Array[Float] = {
    val sb = (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
    val scale = java.lang.Float.intBitsToFloat(sb)
    val out = new Array[Float](b.length - 4)
    var i = 0
    while (i < out.length) { out(i) = b(4 + i) * scale; i += 1 }
    out
  }

  /** Encode by variant name. Callers handle `f32` themselves (store the
    * float array directly — there is no byte payload for it); passing
    * `f32` here is an error.
    */
  def encode(variant: String, v: Array[Float]): Array[Byte] = variant match {
    case "f16" => encodeF16(v)
    case "i8"  => encodeI8(v)
    case other => throw new IllegalArgumentException(s"unknown variant $other")
  }

  def decode(variant: String, b: Array[Byte]): Array[Float] = variant match {
    case "f16" => decodeF16(b)
    case "i8"  => decodeI8(b)
    case other => throw new IllegalArgumentException(s"unknown variant $other")
  }
}
