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

  /** Minimal recursive-descent JSON reader for the tool mains' OWN
    * artifacts (Bench's round-over-round comparison reads the prior
    * round's bench JSON) — objects become `Map[String, Any]`, arrays
    * `Vector[Any]`, numbers `Double`, plus `String`/`Boolean`/`null`.
    * Throws `IllegalArgumentException` on malformed input; callers
    * that merely *opportunistically* read an artifact should Try it.
    */
  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing content at offset ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    private var i = 0
    def pos: Int = i
    def eof: Boolean = i >= s.length
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def fail(what: String): Nothing =
      throw new IllegalArgumentException(
        s"bad JSON at offset $i (expected $what)")
    private def expect(c: Char): Unit = {
      if (eof || s.charAt(i) != c) fail(s"'$c'")
      i += 1
    }
    def value(): Any = {
      ws()
      if (eof) fail("a value")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => string()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _   => number()
      }
    }
    private def lit(word: String, v: Any): Any =
      if (s.regionMatches(i, word, 0, word.length)) { i += word.length; v }
      else fail(word)
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (!eof && s.charAt(i) == '}') { i += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var more = true
      while (more) {
        ws()
        val k = string()
        ws(); expect(':')
        b += k -> value()
        ws()
        if (!eof && s.charAt(i) == ',') i += 1 else more = false
      }
      expect('}')
      b.result()
    }
    private def arr(): Vector[Any] = {
      expect('['); ws()
      if (!eof && s.charAt(i) == ']') { i += 1; return Vector.empty }
      val b = Vector.newBuilder[Any]
      var more = true
      while (more) {
        b += value()
        ws()
        if (!eof && s.charAt(i) == ',') i += 1 else more = false
      }
      expect(']')
      b.result()
    }
    private def string(): String = {
      expect('"')
      val b = new StringBuilder
      while (!eof && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (eof) fail("an escape")
          s.charAt(i) match {
            case '"'  => b += '"'
            case '\\' => b += '\\'
            case '/'  => b += '/'
            case 'b'  => b += '\b'
            case 'f'  => b += '\f'
            case 'n'  => b += '\n'
            case 'r'  => b += '\r'
            case 't'  => b += '\t'
            case 'u' =>
              if (i + 4 >= s.length) fail("4 hex digits")
              b += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case _ => fail("a valid escape")
          }
        } else b += c
        i += 1
      }
      expect('"')
      b.result()
    }
    private def number(): Double = {
      val start = i
      if (!eof && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      while (!eof && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
      if (i == start) fail("a number")
      try s.substring(start, i).toDouble
      catch { case _: NumberFormatException => fail("a number") }
    }
  }
}
