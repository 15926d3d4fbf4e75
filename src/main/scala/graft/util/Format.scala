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
    if (u == 0) s"$bytes ${units(0)}"
    else {
      // values just under a boundary can ROUND to 1024 (1048571 B is
      // 1023.995 KB); roll over to the next unit instead of "1024 KB"
      var r = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      if (r >= 1024 && u < units.length - 1) {
        r = (r / 1024).setScale(2, BigDecimal.RoundingMode.HALF_UP); u += 1
      }
      s"${r.underlying.stripTrailingZeros.toPlainString} ${units(u)}"
    }
  }
}
