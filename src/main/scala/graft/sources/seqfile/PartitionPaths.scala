package graft.sources.seqfile

/** Hive-style partition path escaping, shared by the write and read sides.
  *
  * Hive (and Spark's own file sources) percent-encode only a reserved set of
  * path-hostile characters — control chars plus `" # % ' * / : = ? \ DEL { [
  * ] ^` — and leave everything else, INCLUDING SPACE, literal. The previous
  * java.net.URLEncoder scheme was form-encoding: it turned space into '+',
  * so a partition value with a space produced a directory external
  * Hive/Spark readers decoded differently, and an externally-written dir
  * containing a literal '+' mis-decoded to a space on our side. This codec
  * round-trips bit-for-bit with external Hive/Spark partition layouts.
  *
  * MIGRATION NOTE (one-time on-disk compat break): lakes written by the
  * old URLEncoder scheme encoded space as '+' and '+' as %2B. Under this
  * codec those directory names read back as literal '+' / '+' (after %2B
  * decode) instead of the original space / '+'. Such values are impossible
  * for THIS writer to have produced (it never emits a raw '+' for space and
  * never escapes '+'), so the read side detects the signature — a '+' or
  * '%2B' in a partition component — and logs a one-time warning naming the
  * affected directory; rename `k=a+b` → `k=a b` (and `%2B` → `+`) to
  * migrate. Values are never silently rewritten: an externally-written
  * legitimate literal '+' must stay a '+'.
  */
private[seqfile] object PartitionPaths {

  private val legacyWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** One-time warning when a partition component carries the legacy
    * form-encoding signature ('+' or '%2B'); see the migration note. */
  def warnIfLegacyEncoded(rawComponent: String): Unit = {
    if ((rawComponent.contains('+') || rawComponent.contains("%2B")) &&
        legacyWarned.compareAndSet(false, true)) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"partition component '$rawComponent' contains '+'/'%2B' — if this " +
          "lake was written by a pre-Hive-escaping graft version, '+' was " +
          "form-encoded space: rename the directories to migrate (values " +
          "are read back literally, never rewritten)")
    }
  }

  private val needsEscape: Array[Boolean] = {
    val b = new Array[Boolean](128)
    (0 until ' '.toInt).foreach(b(_) = true)
    b(0x7F) = true // DEL
    "\"#%'*/:=?\\{[]^".foreach(c => b(c.toInt) = true)
    b
  }

  /** Percent-encode the Hive reserved set; space stays literal. */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach { c =>
      if (c < 128 && needsEscape(c)) sb.append(f"%%${c.toInt}%02X")
      else sb.append(c)
    }
    sb.toString
  }

  /** Inverse of escape: decode %XX sequences, pass everything else (notably
    * '+') through literally. A lone or malformed '%' is kept as-is rather
    * than failing — externally-written directories are not under our
    * control. */
  def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hex = s.substring(i + 1, i + 3)
        try { sb.append(Integer.parseInt(hex, 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
