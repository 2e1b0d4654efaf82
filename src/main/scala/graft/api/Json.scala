package graft.api

/** Minimal self-contained JSON codec for the HTTP service surface (the
  * environment has no JSON library on the compile classpath and the build
  * adds no dependencies). Values map to: Map[String, Any], Vector[Any],
  * String, Double, Boolean, null. */
object Json {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing characters at ${p.pos}")
    v
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def ch: Char = {
      require(!eof, "unexpected end of input")
      s.charAt(pos)
    }
    private def expect(c: Char): Unit = {
      require(ch == c, s"expected '$c' at $pos, got '$ch'")
      pos += 1
    }
    def value(): Any = {
      ws()
      ch match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }
    private def lit(word: String, v: Any): Any = {
      require(s.regionMatches(pos, word, 0, word.length), s"bad literal at $pos")
      pos += word.length
      v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (ch == '}') { pos += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        ws()
        val k = str()
        ws(); expect(':')
        b += k -> value()
        ws()
        if (ch == ',') pos += 1 else { expect('}'); done = true }
      }
      b.result()
    }
    private def arr(): Vector[Any] = {
      expect('['); ws()
      if (ch == ']') { pos += 1; return Vector.empty }
      val b = Vector.newBuilder[Any]
      var done = false
      while (!done) {
        b += value()
        ws()
        if (ch == ',') pos += 1 else { expect(']'); done = true }
      }
      b.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (ch != '"') {
        val c = ch
        pos += 1
        if (c == '\\') {
          val e = ch
          pos += 1
          e match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              require(pos + 4 <= s.length, "bad unicode escape")
              sb += Integer.parseInt(s.substring(pos, pos + 4), 16).toChar
              pos += 4
            case other => sys.error(s"bad escape '\\$other' at $pos")
          }
        } else sb += c
      }
      pos += 1
      sb.toString
    }
    private def num(): Double = {
      val start = pos
      if (!eof && (ch == '-' || ch == '+')) pos += 1
      while (!eof && (s.charAt(pos).isDigit || "+-.eE".contains(s.charAt(pos)))) pos += 1
      require(pos > start, s"expected a value at $start")
      s.substring(start, pos).toDouble
    }
  }

  def write(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    // NaN/Infinity are not valid JSON tokens — render as null so a search
    // response carrying a NaN score (NaN-last ordering makes them
    // representable) stays parseable
    case d: Double if java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d) => "null"
    case d: Double => if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case n: Long => n.toString
    case n: Int => n.toString
    case f: Float => write(f.toDouble)
    case s: String => quote(s)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${quote(k.toString)}:${write(x)}" }.mkString("{", ",", "}")
    case it: Iterable[_] => it.map(write).mkString("[", ",", "]")
    case other => quote(other.toString)
  }

  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    (sb += '"').toString
  }

  // typed accessors for request decoding
  def obj(v: Any): Map[String, Any] = v.asInstanceOf[Map[String, Any]]
  def strs(v: Any): Seq[String] = v.asInstanceOf[Vector[Any]].map(_.asInstanceOf[String])
  def doubles(v: Any): Seq[Double] = v.asInstanceOf[Vector[Any]].map(_.asInstanceOf[Double])
}
