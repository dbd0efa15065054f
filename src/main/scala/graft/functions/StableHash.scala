package graft.functions

/** Stable 64-bit hashing primitives shared by the dedup/LSH operators.
  *
  * All are fixed algorithms (FNV-1a, splitmix64 finalizer) — stable across
  * JVMs, Spark versions, and partitionings, which the deterministic
  * correctness gate requires. Never meant to match any SQL engine's
  * built-in `hash()`.
  */
object StableHash {

  /** FNV-1a 64-bit over UTF-16 code units. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — cheap independent rehash family via seed xor. */
  def mix64(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 33); z *= 0xff51afd7ed558ccdL
    z ^= (z >>> 33); z *= 0xc4ceb9fe1a85ec53L
    z ^= (z >>> 33)
    z
  }

  /** i-th hash of `x` in a seeded family. */
  def family(x: Long, i: Int, seed: Long): Long = mix64(x ^ mix64(seed + i))
}
