package graft.functions

/** Builders for SQL expression fragments that evaluate to IDENTICAL values in
  * Spark SQL and DuckDB.
  *
  * The dedup / fingerprint operators need hash functions that the DuckDB
  * correctness oracle can reproduce exactly, so instead of engine hashes
  * (Spark murmur3 vs DuckDB's) every hash here is plain 64-bit integer
  * arithmetic over `ascii()` codes — expressible in both dialects, with all
  * intermediates kept < 2^63 (DuckDB errors on overflow; Spark 4 runs ANSI).
  *
  * `duck = false` emits Spark SQL (for `expr(...)`), `duck = true` emits the
  * DuckDB dialect (for the oracle strings).
  */
object PortableSql {

  /** Large prime modulus keeping hash values < 2^30. */
  val P: Long = 1000000007L

  def split(s: String, duck: Boolean): String =
    if (duck) s"string_split($s, ' ')" else s"split($s, ' ')"

  def xform(arr: String, v: String, body: String, duck: Boolean): String =
    if (duck) s"list_transform($arr, $v -> $body)" else s"transform($arr, $v -> $body)"

  def filterArr(arr: String, v: String, body: String, duck: Boolean): String =
    if (duck) s"list_filter($arr, $v -> $body)" else s"filter($arr, $v -> $body)"

  def alen(arr: String, duck: Boolean): String =
    if (duck) s"len($arr)" else s"size($arr)"

  def arrayMin(arr: String, duck: Boolean): String =
    if (duck) s"list_min($arr)" else s"array_min($arr)"

  def distinct(arr: String, duck: Boolean): String =
    if (duck) s"list_distinct($arr)" else s"array_distinct($arr)"

  def contains(arr: String, x: String, duck: Boolean): String =
    if (duck) s"list_contains($arr, $x)" else s"array_contains($arr, $x)"

  def elem(arr: String, i: String, duck: Boolean): String =
    if (duck) s"$arr[$i]" else s"element_at($arr, $i)"

  def seqIncl(from: String, to: String, duck: Boolean): String =
    if (duck) s"generate_series($from, $to)" else s"sequence($from, $to)"

  /** Left fold to BIGINT with zero initial accumulator. DuckDB's list_reduce
    * has no explicit init, so the zero is prepended.
    */
  def reduceLong(arr: String, a: String, x: String, body: String, duck: Boolean): String =
    if (duck) s"list_reduce(list_prepend(CAST(0 AS BIGINT), $arr), ($a, $x) -> $body)"
    else s"aggregate($arr, CAST(0 AS BIGINT), ($a, $x) -> $body)"

  def shr(x: String, n: Int, duck: Boolean): String =
    if (duck) s"($x >> $n)" else s"shiftright($x, $n)"

  def bxor(x: String, y: String, duck: Boolean): String =
    if (duck) s"xor($x, $y)" else s"($x ^ $y)"

  /** Integer bit length (floor(log2(x)) + 1 for x >= 1) as a generated
    * comparison ladder — pure integer comparisons, so the SAME string
    * works in both dialects and no libm log2 (whose rounding differs
    * across engines) ever enters an oracle-compared value.
    */
  def bitLen(x: String, maxBits: Int = 48): String =
    (0 until maxBits).map(k => s"(CASE WHEN $x >= ${1L << k} THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Dialect-portable integer division (Spark `DIV`, DuckDB `//`). */
  def idiv(a: String, b: String, duck: Boolean): String =
    if (duck) s"($a // $b)" else s"($a DIV $b)"

  /** Largest power of two <= x (x >= 1) as a comparison ladder — the
    * variable-shift-free companion of [[bitLen]] (neither dialect
    * guarantees column-valued shift counts).
    */
  def pow2Floor(x: String, maxBits: Int = 48): String =
    ((maxBits - 1) to 1 by -1)
      .map(k => s"WHEN $x >= ${1L << k} THEN ${1L << k}")
      .mkString("(CASE ", " ", " ELSE 1 END)")

  /** Fixed-point log2 in EIGHTH-BITS (resolution 0.125 bit) — the
    * higher-resolution sibling of [[bitLen]] for scores where whole-bit
    * granularity collapses (e.g. IDF over a corpus whose document
    * frequencies all share one octave). Pure integer comparisons +
    * one portable integer division, so the SAME value comes out of both
    * engines: normalize x to its mantissa m = x*256 / 2^(bitLen-1) in
    * [256, 512), then count the precomputed 2^(k/8) thresholds passed.
    * The threshold constants are baked into the generated string at
    * build time, so both dialects compare against identical literals.
    * Domain: 1 <= x < 2^55 (the x*256 headroom; maxBits defaults to the
    * full domain, unlike bitLen's 48, because the *256 scaling shifts
    * where the ladder must stop).
    */
  def log2Eighths(x: String, maxBits: Int = 55, duck: Boolean = false): String =
    s"(8 * (${bitLen(x, maxBits)} - 1) + ${l8Frac(l8Mantissa(x, maxBits, duck))})"

  /** [[log2Eighths]] building blocks, exposed so the Spark side can STAGE
    * them through intermediate columns: inlining the mantissa into the
    * fraction ladder repeats the ~55-branch pow2Floor seven times, and the
    * resulting ~400-branch expression costs whole SECONDS of JIT compile
    * time per query (measured 12.5 jit-s on q_tfidf_terms) even when it
    * only ever evaluates on a vocabulary-sized frame. The DuckDB oracle
    * keeps the single-expression form (no codegen there); the staged and
    * inline forms compute identical integers by construction.
    */
  def l8Mantissa(x: String, maxBits: Int = 55, duck: Boolean = false): String =
    idiv(s"(($x) * 256)", pow2Floor(x, maxBits), duck)

  def l8Frac(m: String): String = (1 to 7)
    .map(k => s"(CASE WHEN $m >= ${Math.round(256.0 * math.pow(2.0, k / 8.0))} THEN 1 ELSE 0 END)")
    .mkString("(", " + ", ")")

  /** Deterministic string hash, identical in both engines: a base-127
    * polynomial over the first 16 characters (mod P each step so nothing
    * overflows), salted with the string length. Range [0, P).
    */
  def strHash(w: String): String = {
    val poly = (1 to 16).foldLeft("CAST(0 AS BIGINT)") { (acc, i) =>
      s"(($acc * 127 + coalesce(ascii(substr($w, $i, 1)), 0)) % $P)"
    }
    s"(($poly * 31 + length($w)) % $P)"
  }

  /** Word-token array of a single-space-separated text column. */
  def tokens(textCol: String, duck: Boolean): String = split(textCol, duck)

  /** Array of hashed word tokens. */
  def tokenHashes(textCol: String, duck: Boolean): String =
    xform(tokens(textCol, duck), "w", strHash("w"), duck)

  /** Distinct word-trigram shingles ("w1 w2 w3" strings). Documents with
    * fewer than 3 tokens yield an EMPTY array — the guard matters because
    * Spark's `sequence(1, n-2)` with n < 3 produces a DESCENDING range
    * (so element_at(toks, 0) would throw under ANSI) while DuckDB's
    * generate_series is empty; the CASE makes both dialects agree.
    */
  /** All word bigrams IN ORDER, duplicates kept — repetition statistics
    * count them (contrast trigramShingles' distinct set semantics). Same
    * <2-token guard: Spark's sequence(1, 0) yields a DESCENDING range.
    */
  def bigramsAll(toksCol: String, duck: Boolean): String = {
    val idx = seqIncl("1", s"${alen(toksCol, duck)} - 1", duck)
    val gram = s"${elem(toksCol, "i", duck)} || ' ' || ${elem(toksCol, "i + 1", duck)}"
    val grams = xform(idx, "i", gram, duck)
    val empty = if (duck) "CAST([] AS VARCHAR[])" else "CAST(array() AS ARRAY<STRING>)"
    s"(CASE WHEN ${alen(toksCol, duck)} >= 2 THEN $grams ELSE $empty END)"
  }

  /** All word trigrams IN ORDER, duplicates kept — the occurrence-level
    * twin of trigramShingles (same <3-token guard).
    */
  def trigramsAll(toksCol: String, duck: Boolean): String = {
    val idx = seqIncl("1", s"${alen(toksCol, duck)} - 2", duck)
    val gram = s"${elem(toksCol, "i", duck)} || ' ' || ${elem(toksCol, "i + 1", duck)} || ' ' || ${elem(toksCol, "i + 2", duck)}"
    val grams = xform(idx, "i", gram, duck)
    val empty = if (duck) "CAST([] AS VARCHAR[])" else "CAST(array() AS ARRAY<STRING>)"
    s"(CASE WHEN ${alen(toksCol, duck)} >= 3 THEN $grams ELSE $empty END)"
  }

  def trigramShingles(toksCol: String, duck: Boolean): String = {
    val idx = seqIncl("1", s"${alen(toksCol, duck)} - 2", duck)
    val gram = s"${elem(toksCol, "i", duck)} || ' ' || ${elem(toksCol, "i + 1", duck)} || ' ' || ${elem(toksCol, "i + 2", duck)}"
    val grams = distinct(xform(idx, "i", gram, duck), duck)
    val empty = if (duck) "CAST([] AS VARCHAR[])" else "CAST(array() AS ARRAY<STRING>)"
    s"(CASE WHEN ${alen(toksCol, duck)} >= 3 THEN $grams ELSE $empty END)"
  }

  /** MinHash permutation parameters (fixed primes; a_k * h stays < 2^58). */
  val minhashA: Seq[Long] = Seq(1299721L, 15485863L, 32452843L, 49979687L,
    67867967L, 86028121L, 104395301L, 122949823L)
  val minhashB: Seq[Long] = Seq(7L, 911L, 24749L, 38873L, 52859L, 67061L, 81353L, 95701L)

  /** k-th minhash of an array-of-hashes column. */
  def minhash(hashesCol: String, k: Int, duck: Boolean): String =
    arrayMin(xform(hashesCol, "h",
      s"((${minhashA(k)} * h + ${minhashB(k)}) % $P)", duck), duck)

  /** 24-bit SimHash of an array-of-hashes column: bit i set iff the majority
    * of token hashes have bit i set.
    */
  def simhash24(hashesCol: String, duck: Boolean): String = {
    val n = alen(hashesCol, duck)
    val terms = (0 until 24).map { i =>
      val ones = alen(filterArr(hashesCol, "h", s"(${shr("h", i, duck)} & 1) = 1", duck), duck)
      s"(CASE WHEN 2 * $ones > $n THEN ${1L << i} ELSE 0 END)"
    }
    s"CAST(${terms.mkString("(", " + ", ")")} AS BIGINT)"
  }

  /** Exact Jaccard similarity of two distinct-element array columns.
    *
    * Intersection via the engines' native set-intersect (hash-build over
    * one side, O(|a|+|b|)) instead of a per-element `contains` scan
    * (O(|a|·|b|)) — the per-pair cost is what dominates a verify join at
    * scale. Defined as 0 when either side is empty (guards the ANSI
    * divide-by-zero on two <3-token docs).
    */
  def jaccard(a: String, b: String, duck: Boolean): String = {
    val inter =
      if (duck) s"len(list_intersect($a, $b))"
      else s"size(array_intersect($a, $b))"
    s"(CASE WHEN ${alen(a, duck)} = 0 OR ${alen(b, duck)} = 0 THEN 0.0" +
      s" ELSE CAST($inter AS DOUBLE) / (${alen(a, duck)} + ${alen(b, duck)} - $inter) END)"
  }

  /** Deterministic pseudo-random double in [-0.5, 0.5) from an integer seed
    * expression — stands in for random hyperplane components.
    */
  def pseudoUniform(seedExpr: String): String =
    s"((($seedExpr) * 2654435761 % 1000003) / 1000003.0 - 0.5)"

  /** Knuth seed ladder over a row id, in [0, 1000003): the ONE shared
    * definition (Scala + SQL fragment) for codec/signal generators —
    * hand-copying it desynchronizes a query from its oracle silently.
    * The id is reduced mod 2^31-1 first so the multiply stays in int64
    * under ANSI at any key range.
    */
  def seedLadder(id: Long, mod: Long = 1000003L): Long =
    (id % 2147483647L) * 2654435761L % mod

  def seedLadderSql(idCol: String, mod: Long = 1000003L): String =
    s"($idCol % 2147483647) * 2654435761 % $mod"

  /** Dot product of two double-array columns (sequential left-to-right sum;
    * both engines fold in element order so the IEEE result is identical).
    */
  def dot(a: String, b: String, duck: Boolean): String =
    if (duck) s"list_dot_product($a, $b)"
    else s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"

  /** Cast a float array to double (all arithmetic happens in double). */
  def toDoubleArr(arr: String, duck: Boolean): String =
    xform(arr, "x", "CAST(x AS DOUBLE)", duck)

  /** Integer floor square root, EXACT for x in [0, 2^52): IEEE-754
    * `sqrt` is CORRECTLY ROUNDED — a spec requirement, not an
    * implementation choice — so both engines compute the identical
    * double, and below 2^52 every integer is exactly representable, so
    * floor(sqrt(x)) is off by at most one. Two pure-integer boundary
    * corrections (w² > x, (w+1)² <= x) then pin the exact floor —
    * PropertySpec sweeps the domain against floor(Math.sqrt) through
    * the real SQL path. This is the portable bridge that turns the
    * engine's exact rational statistics (Pearson numerators etc.) into
    * actual root-scaled values without losing cross-engine exactness.
    */
  def isqrtSql(x: String, duck: Boolean): String = {
    val w = s"CAST(floor(sqrt(CAST($x AS DOUBLE))) AS BIGINT)"
    val w1 = s"(CASE WHEN $w * $w > $x THEN $w - 1 ELSE $w END)"
    s"(CASE WHEN ($w1 + 1) * ($w1 + 1) <= $x THEN $w1 + 1 ELSE $w1 END)"
  }
}
