package graft.util

/** Minimal JSON writing for driver-side metadata (audit payloads,
  * oracle manifests). Escapes backslash, quote, and ALL control chars
  * — a tab or CR in a payload must not produce invalid JSON (the
  * reference serializes event payloads with JSON.stringify,
  * lib/book.js:238; F11).
  */
object Json {
  def escape(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }

  def str(s: String): String = "\"" + escape(s) + "\""

  /** Object with string values, keys in the given order. */
  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${str(k)}: ${str(v)}" }.mkString("{", ",", "}")
}
