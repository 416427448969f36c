package graft.sources

/** Hive path-segment codec shared by the Delta and Iceberg interop
  * readers/writers — ONE definition, so an escaping fix can never leave
  * the two formats decoding the same `col=value` directory segment
  * differently. */
private[sources] object HivePath {

  /** Undo Spark/Hive path-name escaping (%XX) in a `col=value`
    * directory segment. Lone '%' characters that do not start a valid
    * two-hex-digit escape pass through unchanged. */
  def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length &&
          s.substring(i + 1, i + 3).forall(ch => Character.digit(ch, 16) >= 0)) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
