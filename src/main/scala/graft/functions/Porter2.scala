package graft.functions

/** Porter2 (Snowball English) stemmer, implemented from the published
  * algorithm description (snowballstem.org/algorithms/english/stemmer.html).
  *
  * The reference stems text-attribute tokens with Snowball before indexing
  * (rs/index/src/tokenizer/stemming_tokenizer.rs:16-60); of its 19 declared
  * languages only English gets a real stemmer here — other languages fall
  * back to lowercase passthrough (deviation recorded in SURVEY §7.4; the
  * reference itself falls back Vietnamese→English, stemming_tokenizer.rs:26).
  */
object Porter2 {
  private val vowels = "aeiouy".toSet

  private val exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exceptions2 = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = "cdeghkmnrt".toSet

  def stem(input: String): String = {
    var w = input.toLowerCase
    if (w.length < 3) return w
    if (w.charAt(0) == '\'') w = w.substring(1)
    exceptions1.get(w) match { case Some(s) => return s; case None => }
    if (w.length < 3) return w

    // y after vowel or at start is a consonant -> mark as 'Y'
    val sb = new StringBuilder(w)
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && vowels(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString

    def isVowel(c: Char): Boolean = vowels(c) // 'Y' is consonant

    def r1Of(s: String): Int = {
      for (p <- Seq("gener", "commun", "arsen")) if (s.startsWith(p)) return p.length
      var j = 1
      while (j < s.length) {
        if (!isVowel(s.charAt(j)) && isVowel(s.charAt(j - 1))) return j + 1
        j += 1
      }
      s.length
    }
    def r2Of(s: String, r1: Int): Int = {
      var j = r1 + 1
      while (j < s.length) {
        if (!isVowel(s.charAt(j)) && isVowel(s.charAt(j - 1))) return j + 1
        j += 1
      }
      s.length
    }
    def inR1(s: String, suffix: String): Boolean = s.length - suffix.length >= r1Of(s)
    def inR2(s: String, suffix: String): Boolean = {
      val r1 = r1Of(s); s.length - suffix.length >= r2Of(s, r1)
    }
    def containsVowel(s: String, from: Int, until: Int): Boolean = {
      var j = from
      while (j < until) { if (isVowel(s.charAt(j))) return true; j += 1 }
      false
    }
    // "short syllable": vowel followed by non-vowel other than w/x/Y,
    // preceded by a non-vowel; or a vowel at position 0 followed by non-vowel.
    def endsShortSyllable(s: String): Boolean = {
      val n = s.length
      if (n == 2) isVowel(s.charAt(0)) && !isVowel(s.charAt(1))
      else if (n >= 3) {
        val c = s.charAt(n - 1); val v = s.charAt(n - 2); val p = s.charAt(n - 3)
        isVowel(v) && !isVowel(c) && c != 'w' && c != 'x' && c != 'Y' && !isVowel(p)
      } else false
    }
    def isShortWord(s: String): Boolean = endsShortSyllable(s) && r1Of(s) == s.length

    // Step 0: strip ' / 's / 's'
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    } else if (w.endsWith("ss") || w.endsWith("us")) { /* no-op */ }
    else if (w.endsWith("s") && containsVowel(w, 0, w.length - 2)) w = w.dropRight(1)

    if (exceptions2(w)) return w.replace('Y', 'y')

    // Step 1b
    val step1bDone: Boolean = {
      if (w.endsWith("eedly")) { if (inR1(w, "eedly")) w = w.dropRight(3); true }
      else if (w.endsWith("eed")) { if (inR1(w, "eed")) w = w.dropRight(1); true }
      else false
    }
    if (!step1bDone) {
      val suf = Seq("ingly", "edly", "ing", "ed").find(w.endsWith)
      suf.foreach { s =>
        if (containsVowel(w, 0, w.length - s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
          else if (w.length >= 2 && doubles(w.takeRight(2))) w = w.dropRight(1)
          else if (isShortWord(w)) w = w + "e"
        }
      }
    }

    // Step 1c: y -> i when preceded by a non-vowel that isn't the first char
    if (w.length > 2 && (w.last == 'y' || w.last == 'Y') && !isVowel(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // Step 2 (longest suffix, in R1)
    val step2: Seq[(String, String => Option[String])] = Seq(
      "ization" -> (s => Some(s.dropRight(7) + "ize")),
      "ational" -> (s => Some(s.dropRight(7) + "ate")),
      "fulness" -> (s => Some(s.dropRight(4))),
      "ousness" -> (s => Some(s.dropRight(4))),
      "iveness" -> (s => Some(s.dropRight(4))),
      "tional" -> (s => Some(s.dropRight(2))),
      "biliti" -> (s => Some(s.dropRight(6) + "ble")),
      "lessli" -> (s => Some(s.dropRight(2))),
      "entli" -> (s => Some(s.dropRight(2))),
      "ation" -> (s => Some(s.dropRight(5) + "ate")),
      "alism" -> (s => Some(s.dropRight(3))),
      "aliti" -> (s => Some(s.dropRight(5) + "al")),
      "ousli" -> (s => Some(s.dropRight(2))),
      "iviti" -> (s => Some(s.dropRight(5) + "ive")),
      "fulli" -> (s => Some(s.dropRight(2))),
      "enci" -> (s => Some(s.dropRight(1) + "e")),
      "anci" -> (s => Some(s.dropRight(1) + "e")),
      "abli" -> (s => Some(s.dropRight(1) + "e")),
      "izer" -> (s => Some(s.dropRight(1))),
      "ator" -> (s => Some(s.dropRight(2) + "e")),
      "alli" -> (s => Some(s.dropRight(2))),
      "bli" -> (s => Some(s.dropRight(1) + "e")),
      "ogi" -> (s => if (s.length >= 4 && s.charAt(s.length - 4) == 'l') Some(s.dropRight(1)) else None),
      "li" -> (s => if (s.length >= 3 && liEnding(s.charAt(s.length - 3))) Some(s.dropRight(2)) else None))
    step2.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, fn) =>
      if (inR1(w, suf)) fn(w).foreach(w = _)
    }

    // Step 3 (longest suffix, in R1; "ative" needs R2)
    val step3: Seq[(String, String => Option[String])] = Seq(
      "ational" -> (s => Some(s.dropRight(7) + "ate")),
      "tional" -> (s => Some(s.dropRight(2))),
      "alize" -> (s => Some(s.dropRight(3))),
      "icate" -> (s => Some(s.dropRight(3))),
      "iciti" -> (s => Some(s.dropRight(5) + "ic")),
      "ative" -> (s => if (inR2(s, "ative")) Some(s.dropRight(5)) else None),
      "ical" -> (s => Some(s.dropRight(2))),
      "ness" -> (s => Some(s.dropRight(4))),
      "ful" -> (s => Some(s.dropRight(3))))
    step3.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, fn) =>
      if (inR1(w, suf)) fn(w).foreach(w = _)
    }

    // Step 4 (longest suffix, in R2)
    val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")
    step4.find(w.endsWith).foreach { suf =>
      if (inR2(w, suf)) {
        if (suf == "ion") {
          if (w.length > 3 && (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
            w = w.dropRight(3)
        } else w = w.dropRight(suf.length)
      }
    }

    // Step 5
    if (w.endsWith("e") &&
        (inR2(w, "e") || (inR1(w, "e") && !endsShortSyllable(w.dropRight(1)))))
      w = w.dropRight(1)
    else if (w.endsWith("ll") && inR2(w, "l")) w = w.dropRight(1)

    w.replace('Y', 'y')
  }
}
