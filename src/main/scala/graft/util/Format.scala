package graft.util

/** F12 filesize humanize — the reference reports export sizes through
  * `filesize(stats.size)` progress logs (`mysql.js:655`). Base-2
  * steps, conventional symbols, at most two decimals with trailing
  * zeros trimmed: "500 B", "1.5 KB", "259.1 KB", "117.74 MB".
  */
object Format {
  private val units = Array("B", "KB", "MB", "GB", "TB", "PB", "EB")

  def humanBytes(bytes: Long): String = {
    require(bytes >= 0, s"negative size: $bytes")
    var v = bytes.toDouble
    var u = 0
    while (v >= 1024.0 && u < units.length - 1) { v /= 1024.0; u += 1 }
    val s =
      if (u == 0) bytes.toString
      else BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .underlying.stripTrailingZeros.toPlainString
    s"$s ${units(u)}"
  }
}
