package graft.engine

/** DuckDB SQL mirrors of the engine's 64-bit hash primitives
  * ([[Dedup.hash64]] = md5-base + splitmix64 finalizer, and the winnowing
  * rolling hash in [[TextOps]]): every arithmetic step is rendered as
  * wraparound-exact HUGEINT SQL, so the oracle can recompute LSH signatures,
  * band keys, pigeonhole blocks and winnowing fingerprints independently —
  * the same pattern as [[Similarity.srpSignsSqlLiteral]] for SRP buckets.
  *
  * Nested single-element list comprehensions (`[body for v in [value]][1]`)
  * serve as let-bindings, so each intermediate is rendered and evaluated
  * once instead of exploding exponentially through the mix chain.
  */
private[graft] object HashSql {

  /** 2^64 / 2^63 as SQL literals (HUGEINT arithmetic). */
  val U64 = "18446744073709551616"
  private val S63 = "9223372036854775808"

  /** splitmix64 golden-ratio increment, as an unsigned BigInteger. */
  val golden: java.math.BigInteger = new java.math.BigInteger("9e3779b97f4a7c15", 16)

  /** let-binding: evaluate `value` once as `name` inside `body`. */
  def bind(name: String, value: String, body: String): String =
    s"[$body for $name in [$value]][1]"

  /** (z * c) mod 2^64 for unsigned z < 2^64 held in HUGEINT (c < 2^64).
    * Splits z into 32-bit halves to keep intermediates under 2^96
    * (HUGEINT max is 2^127−1). `z` must be a bound variable name. */
  private def mulmod(z: String, c: String): String =
    s"((($z % 4294967296) * $c) + ((($z // 4294967296) * $c) % 4294967296) * 4294967296) % $U64"

  /** splitmix64 finalizer over an unsigned (< 2^64) HUGEINT expression. */
  def mix64(z: String): String =
    bind("mz0", z,
      bind("mz1", "xor(mz0, mz0 // 1073741824)", // z ^= z >>> 30
        bind("mz2", mulmod("mz1", "13787848793156543929"), // *= 0xbf58476d1ce4e5b9
          bind("mz3", "xor(mz2, mz2 // 134217728)", // z ^= z >>> 27
            bind("mz4", mulmod("mz3", "10723151780598845931"), // *= 0x94d049bb133111eb
              "xor(mz4, mz4 // 2147483648)"))))) // z ^ (z >>> 31)

  /** First 8 MD5 bytes of a string expression, big-endian, as unsigned HUGEINT. */
  def md5Base(s: String): String =
    s"CAST(CAST('0x' || substr(md5($s), 1, 16) AS UBIGINT) AS HUGEINT)"

  /** Unsigned HUGEINT (< 2^64) → the signed 64-bit value Spark holds. */
  def toSigned(u: String): String =
    bind("tsv", u, s"CAST(CASE WHEN tsv >= $S63 THEN tsv - $U64 ELSE tsv END AS BIGINT)")

  /** Signed BIGINT expression → unsigned HUGEINT in [0, 2^64). */
  def toUnsigned(x: String): String =
    bind("tuv", s"CAST($x AS HUGEINT)", s"CASE WHEN tuv < 0 THEN tuv + $U64 ELSE tuv END")

  /** `(seed * golden) mod 2^64` — the per-seed additive constant of
    * [[Dedup.hash64]], precomputed so the SQL adds one literal. */
  def seedAdd(seed: Int): java.math.BigInteger =
    java.math.BigInteger.valueOf(seed.toLong).multiply(golden)
      .mod(java.math.BigInteger.ONE.shiftLeft(64))

  /** [[Dedup.hash64]](sExpr, seed) as a signed BIGINT SQL expression. */
  def hash64(sExpr: String, seed: Int): String =
    toSigned(mix64(s"(${md5Base(sExpr)} + ${seedAdd(seed)}) % $U64"))

  /** [[Dedup.hash64]] kept UNSIGNED (HUGEINT in [0, 2^64)) — the form
    * [[graft.engine.Pipeline.bucketOf]]'s `remainderUnsigned` sees. */
  def hash64Unsigned(sExpr: String, seed: Int): String =
    mix64(s"(${md5Base(sExpr)} + ${seedAdd(seed)}) % $U64")

  /** `remainderUnsigned(hash64(s, seed), m)` as a BIGINT SQL expression —
    * the deterministic bucket assignment of the Pipeline split/sample ops. */
  def bucket(sExpr: String, seed: Int, m: Long): String =
    s"CAST(${hash64Unsigned(sExpr, seed)} % $m AS BIGINT)"

  /** [[Dedup.hash64]] with the seed supplied by a comprehension VARIABLE
    * (`seedVar · golden` folded mod 2^64 in SQL). */
  def hash64SeedVar(sExpr: String, seedVar: String): String =
    toSigned(mix64(s"(${md5Base(sExpr)} + ($seedVar * $golden) % $U64) % $U64"))

  /** The minhash band-key fold of [[Dedup]]'s signature stage:
    * `acc₀ = golden + band; acc = ((acc ^ sig_r) · 0x100000001b3) mod 2^64`
    * over the band's rows. `sigsExpr` must be a HUGEINT list of the band's
    * UNSIGNED signature values; `bandVar` the band-index variable.
    * (list_reduce starts from the first element, so acc₀ is prepended.) */
  def bandKey(bandVar: String, sigsExpr: String): String =
    s"list_reduce([CAST(($golden + $bandVar) % $U64 AS HUGEINT)] || $sigsExpr, " +
      s"(a, x) -> ${bind("bk", "xor(a, x)", mulmod("bk", "1099511628211"))})"

  /** `[2^0, …, 2^63]` as a HUGEINT[] literal (bit tests on unsigned hashes). */
  def pow2List: String =
    (0 until 64).map(j => java.math.BigInteger.ONE.shiftLeft(j).toString)
      .mkString("[", ",", "]") + "::HUGEINT[]"

  /** The winnowing rolling hash over a HUGEINT code list expression
    * (`list_reduce` starts from the first element, which equals the
    * engine's 0-seeded fold), finished with `h ^ (h >>> 33)`; signed. */
  def rollHash(codesExpr: String): String =
    toSigned(bind("rh",
      s"list_reduce($codesExpr, (a, c) -> (a * 1000003 + c) % $U64)",
      "xor(rh, rh // 8589934592)"))
}
