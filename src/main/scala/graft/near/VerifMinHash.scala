package graft.near

/** Compiled kernels for the ORACLE-GRADE MinHash verification chains
  * (SparkEntry's q_minhash_sigs / q_bbit_sketch / q_minhash_oph).
  *
  * The chains were previously pure Column expressions built from
  * higher-order functions (`transform` / `aggregate` / `zip_with`).
  * Catalyst HOFs are NOT whole-stage-codegen'd: each lambda body is an
  * interpreted Expression tree re-evaluated per array element with
  * boxed longs — on the 128-permutation min fold that is 128·|S|
  * interpreted eval() calls per document, the dominant cost of all
  * three queries (q_bbit_sketch alone was ~22 s of a ~142 s bench at
  * sf0.1). These kernels compute the IDENTICAL integer arithmetic in
  * tight primitive loops (the `Ann.dotUdf` precedent: compiled UDF vs
  * interpreted HOF is 10-50× on per-element hot paths), so the query
  * results are bit-for-bit unchanged — VerifKernelSpec pins each
  * kernel against the original expression chain.
  *
  * Contract mirrored exactly:
  *  - shingles: the DISTINCT 5-token shingle strings of `split(trim
  *    (text), "\\s+")` tokens — except that distinctness is
  *    IRRELEVANT to a min fold (min over a multiset equals min over
  *    its set), so the kernels skip the dedup;
  *  - hash: first 7 hex chars of md5(UTF-8 bytes) as a long
  *    (functions.Hashing.hexPrefixLong semantics, 28 bits);
  *  - permutation p: (a_p·h + b_p) mod 2147483647 — a < 2^31,
  *    h < 2^28 keeps every product < 2^59 (overflow-free in ANSI
  *    longs, same as the Column chain);
  *  - docs shorter than 5 tokens collapse to ONE whole-doc shingle
  *    (tokens joined by single spaces), mirroring
  *    SparkEntry.verifShingleStrs.
  */
object VerifMinHash {

  private val Mod = 2147483647L

  /** First 7 hex chars of md5(UTF-8(s)) as a long — the exact value of
    * `conv(substring(md5(s), 1, 7), 16, 10)`: the top 28 bits of the
    * digest read big-endian.
    */
  private def hexPrefix7(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
  }

  /** Fold one shingle hash into all `k` running minima. */
  private def foldPerms(h: Long, a: Array[Long], b: Array[Long],
      sig: Array[Long]): Unit = {
    var p = 0
    val k = a.length
    while (p < k) {
      val v = (a(p) * h + b(p)) % Mod
      if (v < sig(p)) sig(p) = v
      p += 1
    }
  }

  /** The 5-token shingle-string hashes of tokens[from, until) windows,
    * fed to `f` one at a time (no array materialization). `until` is
    * the exclusive END of window STARTS. Assumes until >= from + 1 and
    * each window [i, i+5) in bounds.
    */
  private def eachWindowHash(toks: IndexedSeq[String], from: Int, until: Int,
      md: java.security.MessageDigest)(f: Long => Unit): Unit = {
    val sb = new java.lang.StringBuilder(64)
    var i = from
    while (i < until) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
        .append(toks(i + 2)).append(' ').append(toks(i + 3)).append(' ')
        .append(toks(i + 4))
      f(hexPrefix7(md, sb.toString))
      i += 1
    }
  }

  /** Whole-doc shingle hash for docs under 5 tokens. */
  private def wholeDocHash(toks: IndexedSeq[String],
      md: java.security.MessageDigest): Long =
    hexPrefix7(md, toks.mkString(" "))

  /** The q_minhash_sigs kernel: all `a.length` permutation minima of
    * the doc's shingle-hash set. Never null: callers filter blank
    * docs, and a non-empty token array always yields >= 1 shingle.
    */
  def sigs(toks: IndexedSeq[String], a: Array[Long], b: Array[Long]): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val sig = Array.fill(a.length)(Long.MaxValue)
    val n = toks.length
    if (n < 5) foldPerms(wholeDocHash(toks, md), a, b, sig)
    else eachWindowHash(toks, 0, n - 4, md)(h => foldPerms(h, a, b, sig))
    sig
  }

  /** The q_bbit_sketch kernel: (m_full, m_bbit) — full-width and 2-bit
    * signature match counts between the doc's signature and the
    * signature of the doc MINUS its last token. For n >= 6 tokens
    * (the query's filter) both sides run the window path and toks2's
    * windows are exactly toks's windows minus the LAST one, so the
    * shared windows are folded ONCE and only the last window is folded
    * separately into sig1 — bit-identical to two independent chains,
    * at half the hash work. Shorter docs fall back to two independent
    * chains (general-correctness path, exercised by VerifKernelSpec).
    */
  def bbitMatches(toks: IndexedSeq[String], a: Array[Long],
      b: Array[Long]): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val k = a.length
    val n = toks.length
    val sig2 = Array.fill(k)(Long.MaxValue)
    val sig1 = new Array[Long](k)
    if (n >= 6) {
      // shared windows 0 .. n-6; toks has one extra window at n-5
      eachWindowHash(toks, 0, n - 5, md)(h => foldPerms(h, a, b, sig2))
      System.arraycopy(sig2, 0, sig1, 0, k)
      eachWindowHash(toks, n - 5, n - 4, md)(h => foldPerms(h, a, b, sig1))
    } else {
      val s1 = sigs(toks, a, b)
      val s2 = sigs(toks.dropRight(1), a, b)
      System.arraycopy(s1, 0, sig1, 0, k)
      System.arraycopy(s2, 0, sig2, 0, k)
    }
    var mFull = 0L
    var mBbit = 0L
    var p = 0
    while (p < k) {
      if (sig1(p) == sig2(p)) mFull += 1
      if ((sig1(p) & 3L) == (sig2(p) & 3L)) mBbit += 1
      p += 1
    }
    (mFull, mBbit)
  }

  /** The q_minhash_oph kernel: one-permutation signature with rotation
    * densification over `bins` bins — v = (a·h + b) mod 2147483647,
    * bin = v % bins, per-bin min, then each bin j takes
    * min over d of (mins[(j+d) % bins] + d·2^31) over FILLED bins
    * (2^31 = 2147483648 strictly above any bin value, so the smallest
    * borrow distance wins exactly — the Column chain's closed form).
    */
  def ophDensified(toks: IndexedSeq[String], a: Long, b: Long,
      bins: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[Long](bins)
    val filled = new Array[Boolean](bins)
    def fold(h: Long): Unit = {
      val v = (a * h + b) % Mod
      val j = (v % bins).toInt
      if (!filled(j) || v < mins(j)) { mins(j) = v; filled(j) = true }
    }
    val n = toks.length
    if (n < 5) fold(wholeDocHash(toks, md))
    else eachWindowHash(toks, 0, n - 4, md)(fold)
    val C = 2147483648L
    Array.tabulate(bins) { j =>
      var best = Long.MaxValue
      var d = 0
      while (d < bins) {
        val src = (j + d) % bins
        if (filled(src)) {
          val v = mins(src) + d.toLong * C
          if (v < best) best = v
        }
        d += 1
      }
      best
    }
  }
}
