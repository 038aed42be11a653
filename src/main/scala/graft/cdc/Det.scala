package graft.cdc

/** Deterministic hashing / pseudo-randomness helpers. The north rule bans
  * wall-clock and `uuid()`/`rand()` on the data path (replay must be
  * byte-identical), so every "random" quantity is a pure function of
  * (seed, index) built on splitmix64 (public-domain constant mix, Steele et
  * al., "Fast Splittable Pseudorandom Number Generators", OOPSLA'14). */
object Det {
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Combine a seed with stream-discriminator and index. */
  def mix(seed: Long, stream: Long, i: Long): Long =
    splitmix64(splitmix64(seed ^ (stream * 0xA24BAED4963EE407L)) ^ i)

  /** Uniform double in [0, 1). */
  def u01(seed: Long, stream: Long, i: Long): Double =
    (mix(seed, stream, i) >>> 11) * 1.1102230246251565e-16 // 2^-53

  /** Zipf-like skewed index in [0, n): inverse-CDF power approximation —
    * u^alpha concentrates mass at low indices (alpha > 1 = more skew). */
  def skewedIndex(seed: Long, stream: Long, i: Long, n: Int, alpha: Double): Int = {
    val u = u01(seed, stream, i)
    val idx = (math.pow(u, alpha) * n).toInt
    if (idx >= n) n - 1 else idx
  }

  /** 40-hex pseudo SHA-1 (deterministic, collision-safe enough for synthetic
    * commits: 160 bits from chained splitmix). */
  def hex40(seed: Long, stream: Long, i: Long): String = {
    val a = mix(seed, stream, i)
    val b = splitmix64(a)
    val c = splitmix64(b)
    f"$a%016x$b%016x${c & 0xFFFFFFFFL}%08x"
  }
}
