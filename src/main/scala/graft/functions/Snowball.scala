package graft.functions

/** Snowball stemmers for the non-English languages the reference's
  * stemming tokenizer dispatches on
  * (rs/index/src/tokenizer/stemming_tokenizer.rs:22-44). Each is an
  * independent implementation written from the published algorithm
  * descriptions at snowballstem.org (public-domain algorithms), in the
  * same style as [[Porter2]] — not a port of rust-stemmers.
  *
  * Shared machinery: the standard regions. R1 is the region after the
  * first non-vowel following a vowel; R2 is R1 applied again inside R1;
  * RV is language-specific (Romance languages, Russian).
  */
object Snowball {

  /** Dispatch by language name (full name or ISO-639-1 code). Unknown
    * languages return the token unchanged (lowercase passthrough happens
    * in the caller). */
  def stem(lang: String, token: String): String = lang match {
    case "german" | "de" => German.stem(token)
    case "french" | "fr" => French.stem(token)
    case "spanish" | "es" => Spanish.stem(token)
    case "portuguese" | "pt" => Portuguese.stem(token)
    case "italian" | "it" => Italian.stem(token)
    case "russian" | "ru" => Russian.stem(token)
    case "danish" | "da" => Danish.stem(token)
    case "norwegian" | "no" => Norwegian.stem(token)
    case "swedish" | "sv" => Swedish.stem(token)
    case "dutch" | "nl" => Dutch.stem(token)
    case "romanian" | "ro" => SnowballMore.Romanian.stem(token)
    case "finnish" | "fi" => SnowballMore.Finnish.stem(token)
    case "hungarian" | "hu" => SnowballMore.Hungarian.stem(token)
    case "turkish" | "tr" => SnowballMore.Turkish.stem(token)
    case "greek" | "el" => SnowballMore.Greek.stem(token)
    case "arabic" | "ar" => SnowballMore.Arabic.stem(token)
    case "tamil" | "ta" => SnowballMore.Tamil.stem(token)
    case _ => token
  }

  /** Languages with a real stemmer here (callers fall back to lowercase
    * passthrough for the rest and record the deviation). */
  val supported: Set[String] = Set(
    "german", "de", "french", "fr", "spanish", "es",
    "portuguese", "pt", "italian", "it", "russian", "ru",
    "danish", "da", "norwegian", "no", "swedish", "sv", "dutch", "nl",
    "romanian", "ro", "finnish", "fi", "hungarian", "hu", "turkish", "tr",
    "greek", "el", "arabic", "ar", "tamil", "ta")

  private[functions] def standardR1(w: String, isVowel: Char => Boolean): Int = {
    var i = 1
    while (i < w.length) {
      if (!isVowel(w.charAt(i)) && isVowel(w.charAt(i - 1))) return i + 1
      i += 1
    }
    w.length
  }

  private[functions] def standardR2(w: String, r1: Int, isVowel: Char => Boolean): Int = {
    var i = r1 + 1
    while (i < w.length) {
      if (!isVowel(w.charAt(i)) && isVowel(w.charAt(i - 1))) return i + 1
      i += 1
    }
    w.length
  }

  /** Romance-language RV (Spanish/Italian/Portuguese): if the second
    * letter is a consonant, RV is the region after the next vowel; if the
    * first two letters are vowels, after the next consonant; otherwise
    * (consonant-vowel) after the third letter. */
  private[functions] def romanceRV(w: String, isVowel: Char => Boolean): Int = {
    if (w.length < 3) return w.length
    if (!isVowel(w.charAt(1))) {
      var i = 2
      while (i < w.length && !isVowel(w.charAt(i))) i += 1
      math.min(i + 1, w.length)
    } else if (isVowel(w.charAt(0)) && isVowel(w.charAt(1))) {
      var i = 2
      while (i < w.length && isVowel(w.charAt(i))) i += 1
      math.min(i + 1, w.length)
    } else 3
  }

  // ==================================================================
  // German — snowballstem.org/algorithms/german/stemmer.html
  // ==================================================================
  object German {
    private val vowels = "aeiouyäöü".toSet
    private def isV(c: Char) = vowels(c)
    private val sEnding = "bdfghklmnrt".toSet
    private val stEnding = "bdfghklmnt".toSet

    def stem(input: String): String = {
      var w = input.toLowerCase.replace("ß", "ss")
      if (w.length < 3) return finish(w)
      // mark u/y between vowels as consonants
      val sb = new StringBuilder(w)
      var i = 1
      while (i < sb.length - 1) {
        val c = sb.charAt(i)
        if ((c == 'u' || c == 'y') && isV(sb.charAt(i - 1)) && isV(sb.charAt(i + 1)))
          sb.setCharAt(i, if (c == 'u') 'U' else 'Y')
        i += 1
      }
      w = sb.toString
      def isVm(c: Char) = isV(c) // U/Y are consonants now
      var r1 = standardR1(w, isVm)
      if (r1 < 3) r1 = math.min(3, w.length)
      val r2 = standardR2(w, standardR1(w, isVm), isVm)
      def inR1(s: String, suf: Int) = s.length - suf >= r1
      def inR2(s: String, suf: Int) = s.length - suf >= r2

      // Step 1
      if ((w.endsWith("ern") || w.endsWith("em")) && inR1(w, if (w.endsWith("ern")) 3 else 2)) {
        w = w.dropRight(if (w.endsWith("ern")) 3 else 2)
      } else if (w.endsWith("er") && inR1(w, 2)) {
        w = w.dropRight(2)
      } else if ((w.endsWith("en") || w.endsWith("es")) && inR1(w, 2)) {
        w = w.dropRight(2)
        if (w.endsWith("niss")) w = w.dropRight(1)
      } else if (w.endsWith("e") && inR1(w, 1)) {
        w = w.dropRight(1)
        if (w.endsWith("niss")) w = w.dropRight(1)
      } else if (w.endsWith("s") && inR1(w, 1) && w.length >= 2 && sEnding(w.charAt(w.length - 2))) {
        w = w.dropRight(1)
      }

      // Step 2
      if (w.endsWith("est") && inR1(w, 3)) w = w.dropRight(3)
      else if ((w.endsWith("en") || w.endsWith("er")) && inR1(w, 2)) w = w.dropRight(2)
      else if (w.endsWith("st") && inR1(w, 2) && w.length >= 6 &&
        stEnding(w.charAt(w.length - 3))) w = w.dropRight(2)

      // Step 3 (d-suffixes)
      if ((w.endsWith("end") || w.endsWith("ung")) && inR2(w, 3)) {
        w = w.dropRight(3)
        if (w.endsWith("ig") && inR2(w, 2) && !(w.length >= 3 && w.charAt(w.length - 3) == 'e'))
          w = w.dropRight(2)
      } else if ((w.endsWith("isch") && inR2(w, 4) &&
        !(w.length >= 5 && w.charAt(w.length - 5) == 'e'))) {
        w = w.dropRight(4)
      } else if ((w.endsWith("ig") || w.endsWith("ik")) && inR2(w, 2) &&
        !(w.length >= 3 && w.charAt(w.length - 3) == 'e')) {
        w = w.dropRight(2)
      } else if ((w.endsWith("lich") || w.endsWith("heit")) && inR2(w, 4)) {
        w = w.dropRight(4)
        if ((w.endsWith("er") || w.endsWith("en")) && inR1(w, 2)) w = w.dropRight(2)
      } else if (w.endsWith("keit") && inR2(w, 4)) {
        w = w.dropRight(4)
        if (w.endsWith("lich") && inR2(w, 4)) w = w.dropRight(4)
        else if (w.endsWith("ig") && inR2(w, 2)) w = w.dropRight(2)
      }
      finish(w)
    }

    private def finish(w: String): String =
      w.map {
        case 'U' => 'u'; case 'Y' => 'y'
        case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'
        case c => c
      }
  }

  // ==================================================================
  // Spanish — snowballstem.org/algorithms/spanish/stemmer.html
  // ==================================================================
  object Spanish {
    private val vowels = "aeiouáéíóúü".toSet
    private def isV(c: Char) = vowels(c)
    private def deAccent(w: String): String = w.map {
      case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
      case 'ó' => 'o'; case 'ú' => 'u'; case c => c
    }

    private val pronouns = Seq("selas", "selos", "sela", "selo", "las", "les",
      "los", "nos", "me", "se", "la", "le", "lo")

    def stem(input: String): String = {
      var w = input.toLowerCase
      if (w.length < 2) return deAccent(w)
      val rv = romanceRV(w, isV)
      val r1 = standardR1(w, isV)
      val r2 = standardR2(w, r1, isV)
      def inRV(s: String, suf: Int) = s.length - suf >= rv
      def inR1(s: String, suf: Int) = s.length - suf >= r1
      def inR2(s: String, suf: Int) = s.length - suf >= r2

      // Step 0: attached pronoun
      pronouns.find(w.endsWith).foreach { p =>
        val stemPart = w.dropRight(p.length)
        val accented = Seq("iéndo", "ándo", "ár", "ér", "ír")
        val plain = Seq("ando", "iendo", "ar", "er", "ir")
        accented.find(stemPart.endsWith) match {
          case Some(a) if stemPart.length - a.length >= rv =>
            w = stemPart.dropRight(a.length) + deAccent(stemPart.takeRight(a.length))
          case _ =>
            plain.find(stemPart.endsWith) match {
              case Some(a) if stemPart.length - a.length >= rv => w = stemPart
              case _ =>
                if (stemPart.endsWith("yendo") && stemPart.length >= 6 &&
                  stemPart.charAt(stemPart.length - 6) == 'u') w = stemPart
            }
        }
      }

      // Step 1: standard suffix removal
      val before1 = w
      val s1a = Seq("amientos", "imientos", "amiento", "imiento", "anzas", "ables",
        "ibles", "istas", "anza", "icos", "icas", "ismo", "able", "ible", "ista",
        "osos", "osas", "ico", "ica", "oso", "osa", "ismos")
      val s1b = Seq("aciones", "adoras", "adores", "ancias", "adora", "ación",
        "antes", "ancia", "ador", "ante")
      def dropIfR2(sufs: Seq[String]): Boolean =
        sufs.sortBy(-_.length).find(w.endsWith) match {
          case Some(s) if inR2(w, s.length) => w = w.dropRight(s.length); true
          case Some(_) => true // matched but not in R2: longest-match consumed
          case None => false
        }
      if (dropIfR2(s1a)) ()
      else if (s1b.sortBy(-_.length).find(w.endsWith).exists { s =>
        if (inR2(w, s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("ic") && inR2(w, 2)) w = w.dropRight(2)
        }
        true
      }) ()
      else if (w.endsWith("logías") && inR2(w, 6)) w = w.dropRight(6) + "log"
      else if (w.endsWith("logía") && inR2(w, 5)) w = w.dropRight(5) + "log"
      else if (w.endsWith("uciones") && inR2(w, 7)) w = w.dropRight(7) + "u"
      else if (w.endsWith("ución") && inR2(w, 5)) w = w.dropRight(5) + "u"
      else if (w.endsWith("encias") && inR2(w, 6)) w = w.dropRight(6) + "ente"
      else if (w.endsWith("encia") && inR2(w, 5)) w = w.dropRight(5) + "ente"
      else if (w.endsWith("amente")) {
        if (inR1(w, 6)) {
          w = w.dropRight(6)
          if (w.endsWith("iv") && inR2(w, 2)) {
            w = w.dropRight(2)
            if (w.endsWith("at") && inR2(w, 2)) w = w.dropRight(2)
          } else {
            Seq("os", "ic", "ad").find(w.endsWith).foreach { s =>
              if (inR2(w, s.length)) w = w.dropRight(s.length)
            }
          }
        }
      } else if (w.endsWith("mente")) {
        if (inR2(w, 5)) {
          w = w.dropRight(5)
          Seq("ante", "able", "ible").find(w.endsWith).foreach { s =>
            if (inR2(w, s.length)) w = w.dropRight(s.length)
          }
        }
      } else if (w.endsWith("idades")) {
        if (inR2(w, 6)) {
          w = w.dropRight(6)
          Seq("abil", "ic", "iv").find(w.endsWith).foreach { s =>
            if (inR2(w, s.length)) w = w.dropRight(s.length)
          }
        }
      } else if (w.endsWith("idad")) {
        if (inR2(w, 4)) {
          w = w.dropRight(4)
          Seq("abil", "ic", "iv").find(w.endsWith).foreach { s =>
            if (inR2(w, s.length)) w = w.dropRight(s.length)
          }
        }
      } else {
        Seq("ivas", "ivos", "iva", "ivo").find(w.endsWith).foreach { s =>
          if (inR2(w, s.length)) {
            w = w.dropRight(s.length)
            if (w.endsWith("at") && inR2(w, 2)) w = w.dropRight(2)
          }
        }
      }

      // Step 2a: verb suffixes beginning with y (only if step 1 did nothing)
      var did2a = false
      if (w == before1) {
        val ys = Seq("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
          "yes", "ya", "ye", "yo", "yó")
        ys.sortBy(-_.length).find(w.endsWith).foreach { s =>
          if (inRV(w, s.length) && w.length > s.length &&
            w.charAt(w.length - s.length - 1) == 'u') {
            w = w.dropRight(s.length)
            did2a = true
          }
        }
      }

      // Step 2b: other verb suffixes (only if steps 1 and 2a did nothing)
      if (w == before1 && !did2a) {
        val guSufs = Seq("emos", "éis", "en", "es")
        val big = Seq(
          "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
          "aremos", "eríais", "eremos", "iríais", "iremos", "ierais", "ieseis",
          "asteis", "isteis", "ábamos", "áramos", "ásemos", "arían", "arías",
          "aréis", "erían", "erías", "eréis", "irían", "irías", "iréis",
          "ieran", "iesen", "ieron", "iendo", "ieras", "ieses", "abais",
          "arais", "aseis", "íamos", "arán", "arás", "aría", "erán", "erás",
          "ería", "irán", "irás", "iría", "iera", "iese", "aste", "iste",
          "aban", "aran", "asen", "aron", "ando", "abas", "adas", "idas",
          "aras", "ases", "íais", "ados", "idos", "amos", "imos", "ará",
          "aré", "erá", "eré", "irá", "iré", "aba", "ada", "ida", "ara",
          "ase", "ían", "ado", "ido", "ías", "áis", "ía", "ad", "ed", "id",
          "an", "ió", "ar", "er", "ir", "as", "ís")
        val allSorted = (big ++ guSufs).distinct.sortBy(-_.length)
        allSorted.find(w.endsWith).foreach { s =>
          if (inRV(w, s.length)) {
            w = w.dropRight(s.length)
            if (guSufs.contains(s) && w.endsWith("gu")) w = w.dropRight(1)
          }
        }
      }

      // Step 3: residual suffix
      Seq("os", "a", "o", "á", "í", "ó").find(w.endsWith) match {
        case Some(s) if inRV(w, s.length) => w = w.dropRight(s.length)
        case _ =>
          if ((w.endsWith("e") || w.endsWith("é")) && inRV(w, 1)) {
            w = w.dropRight(1)
            if (w.endsWith("gu") && inRV(w, 1)) w = w.dropRight(1)
          }
      }
      deAccent(w)
    }
  }

  // ==================================================================
  // Italian — snowballstem.org/algorithms/italian/stemmer.html
  // ==================================================================
  object Italian {
    private val vowels = "aeiouàèìòù".toSet
    private def isV(c: Char) = vowels(c)

    private val pronouns = Seq("gliela", "gliele", "glieli", "glielo", "gliene",
      "sene", "mela", "mele", "meli", "melo", "mene", "tela", "tele", "teli",
      "telo", "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
      "veli", "velo", "vene", "gli", "ci", "la", "le", "li", "lo", "mi", "ne",
      "si", "ti", "vi").sortBy(-_.length)

    def stem(input: String): String = {
      var w = input.toLowerCase
        .replace('á', 'à').replace('é', 'è').replace('í', 'ì')
        .replace('ó', 'ò').replace('ú', 'ù')
      if (w.length < 2) return w
      // mark u after q, and u/i between vowels
      val sb = new StringBuilder(w)
      var i = 1
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (c == 'u' && sb.charAt(i - 1) == 'q') sb.setCharAt(i, 'U')
        else if ((c == 'u' || c == 'i') && i < sb.length - 1 &&
          isV(sb.charAt(i - 1)) && isV(sb.charAt(i + 1)))
          sb.setCharAt(i, if (c == 'u') 'U' else 'I')
        i += 1
      }
      w = sb.toString
      val rv = romanceRV(w, isV)
      val r1 = standardR1(w, isV)
      val r2 = standardR2(w, r1, isV)
      def inRV(s: String, suf: Int) = s.length - suf >= rv
      def inR1(s: String, suf: Int) = s.length - suf >= r1
      def inR2(s: String, suf: Int) = s.length - suf >= r2

      // Step 0: attached pronoun, preceded by ando/endo (delete) or
      // ar/er/ir (replace with e), in RV
      pronouns.find(w.endsWith).foreach { p =>
        val stemPart = w.dropRight(p.length)
        if ((stemPart.endsWith("ando") || stemPart.endsWith("endo")) &&
          stemPart.length - 4 >= rv) w = stemPart
        else if ((stemPart.endsWith("ar") || stemPart.endsWith("er") ||
          stemPart.endsWith("ir")) && stemPart.length - 2 >= rv) w = stemPart + "e"
      }

      // Step 1: standard suffixes
      val before1 = w
      val s1plain = Seq("atrice", "atrici", "abile", "abili", "ibile", "ibili",
        "mente", "anza", "anze", "iche", "ichi", "ismo", "ismi", "ista", "iste",
        "isti", "istà", "istè", "istì", "ante", "anti", "ico", "ici", "ica",
        "ice", "oso", "osi", "osa", "ose").sortBy(-_.length)
      val handled: Boolean = {
        val azion = Seq("azione", "azioni", "atore", "atori").sortBy(-_.length)
          .find(w.endsWith)
        if (w.endsWith("amente")) {
          if (inR1(w, 6)) {
            w = w.dropRight(6)
            if (w.endsWith("iv") && inR2(w, 2)) {
              w = w.dropRight(2)
              if (w.endsWith("at") && inR2(w, 2)) w = w.dropRight(2)
            } else Seq("os", "ic", "abil").find(w.endsWith).foreach { s =>
              if (inR2(w, s.length)) w = w.dropRight(s.length)
            }
          }
          true
        } else if (azion.isDefined) {
          val s = azion.get
          if (inR2(w, s.length)) {
            w = w.dropRight(s.length)
            if (w.endsWith("ic") && inR2(w, 2)) w = w.dropRight(2)
          }
          true
        } else if (w.endsWith("logia") || w.endsWith("logie")) {
          if (inR2(w, 5)) w = w.dropRight(5) + "log"; true
        } else if (w.endsWith("uzione") || w.endsWith("uzioni") ||
          w.endsWith("usione") || w.endsWith("usioni")) {
          if (inR2(w, 6)) w = w.dropRight(6) + "u"; true
        } else if (w.endsWith("enza") || w.endsWith("enze")) {
          if (inR2(w, 4)) w = w.dropRight(4) + "ente"; true
        } else if (w.endsWith("amento") || w.endsWith("amenti") ||
          w.endsWith("imento") || w.endsWith("imenti")) {
          if (inRV(w, 6)) w = w.dropRight(6); true
        } else if (w.endsWith("ità")) {
          if (inR2(w, 3)) {
            w = w.dropRight(3)
            Seq("abil", "ic", "iv").find(w.endsWith).foreach { s =>
              if (inR2(w, s.length)) w = w.dropRight(s.length)
            }
          }
          true
        } else if (Seq("ivo", "ivi", "iva", "ive").exists(w.endsWith)) {
          if (inR2(w, 3)) {
            w = w.dropRight(3)
            if (w.endsWith("at") && inR2(w, 2)) {
              w = w.dropRight(2)
              if (w.endsWith("ic") && inR2(w, 2)) w = w.dropRight(2)
            }
          }
          true
        } else s1plain.find(w.endsWith) match {
          case Some(s) => if (inR2(w, s.length)) w = w.dropRight(s.length); true
          case None => false
        }
      }

      // Step 2: verb suffixes (only if step 1 removed nothing)
      if (w == before1 || !handled) {
        val verbs = Seq("erebbero", "irebbero", "assero", "assimo", "eranno",
          "erebbe", "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
          "iremmo", "ireste", "iresti", "iscano", "iscono", "issero", "arono",
          "avamo", "avano", "avate", "eremo", "erete", "erono", "evamo",
          "evano", "evate", "iremo", "irete", "irono", "ivamo", "ivano",
          "ivate", "ammo", "ando", "asse", "assi", "emmo", "enda", "ende",
          "endi", "endo", "erai", "erei", "Yamo", "iamo", "immo", "irai",
          "irei", "isca", "isce", "isci", "isco", "ano", "are", "ata", "ate",
          "ati", "ato", "ava", "avi", "avo", "erà", "ere", "erò", "ete",
          "eva", "evi", "evo", "irà", "ire", "irò", "ita", "ite", "iti",
          "ito", "iva", "ivi", "ivo", "ono", "uta", "ute", "uti", "uto",
          "ar", "ir").sortBy(-_.length)
        verbs.find(w.endsWith).foreach { s =>
          if (inRV(w, s.length)) w = w.dropRight(s.length)
        }
      }

      // Step 3a: final vowel (and preceding i) in RV
      Seq("a", "e", "i", "o", "à", "è", "ì", "ò").find(s => w.endsWith(s)) match {
        case Some(s) if inRV(w, 1) =>
          w = w.dropRight(1)
          if (w.endsWith("i") && inRV(w, 1)) w = w.dropRight(1)
        case _ =>
      }
      // Step 3b: ch/gh -> c/g in RV
      if ((w.endsWith("ch") || w.endsWith("gh")) && inRV(w, 1)) w = w.dropRight(1)

      w.map { case 'U' => 'u'; case 'I' => 'i'; case c => c }
    }
  }

  // ==================================================================
  // Portuguese — snowballstem.org/algorithms/portuguese/stemmer.html
  // ==================================================================
  object Portuguese {
    // after the ã/õ -> a~/o~ transform, vowels exclude the tilde forms
    private val vowels = "aeiouáéíóúâêô".toSet
    private def isV(c: Char) = vowels(c)

    def stem(input: String): String = {
      var w = input.toLowerCase.replace("ã", "a~").replace("õ", "o~")
      if (w.length < 2) return untransform(w)
      val rv = romanceRV(w, isV)
      val r1 = standardR1(w, isV)
      val r2 = standardR2(w, r1, isV)
      def inRV(s: String, suf: Int) = s.length - suf >= rv
      def inR1(s: String, suf: Int) = s.length - suf >= r1
      def inR2(s: String, suf: Int) = s.length - suf >= r2

      val original = w
      // Step 1: standard suffix removal
      val s1plain = Seq("amentos", "imentos", "amento", "imento", "adoras",
        "adores", "aço~es", "ismos", "istas", "adora", "aça~o", "antes",
        "ância", "ezas", "icos", "icas", "ismo", "ável", "ível", "ista",
        "osos", "osas", "ador", "ante", "eza", "ico", "ica", "oso", "osa")
        .sortBy(-_.length)
      var step1did = false
      def mark(): Unit = step1did = true
      if (w.endsWith("amente")) {
        if (inR1(w, 6)) {
          w = w.dropRight(6); mark()
          if (w.endsWith("iv") && inR2(w, 2)) {
            w = w.dropRight(2)
            if (w.endsWith("at") && inR2(w, 2)) w = w.dropRight(2)
          } else Seq("os", "ic", "ad").find(w.endsWith).foreach { s =>
            if (inR2(w, s.length)) w = w.dropRight(s.length)
          }
        }
      } else if (w.endsWith("mente")) {
        if (inR2(w, 5)) {
          w = w.dropRight(5); mark()
          Seq("ante", "avel", "ível").find(w.endsWith).foreach { s =>
            if (inR2(w, s.length)) w = w.dropRight(s.length)
          }
        }
      } else if (w.endsWith("idades")) {
        if (inR2(w, 6)) {
          w = w.dropRight(6); mark()
          Seq("abil", "ic", "iv").find(w.endsWith).foreach { s =>
            if (inR2(w, s.length)) w = w.dropRight(s.length)
          }
        }
      } else if (w.endsWith("idade")) {
        if (inR2(w, 5)) {
          w = w.dropRight(5); mark()
          Seq("abil", "ic", "iv").find(w.endsWith).foreach { s =>
            if (inR2(w, s.length)) w = w.dropRight(s.length)
          }
        }
      } else if (w.endsWith("logias")) { if (inR2(w, 6)) { w = w.dropRight(6) + "log"; mark() } }
      else if (w.endsWith("logia")) { if (inR2(w, 5)) { w = w.dropRight(5) + "log"; mark() } }
      else if (w.endsWith("uço~es")) { if (inR2(w, 6)) { w = w.dropRight(6) + "u"; mark() } }
      else if (w.endsWith("uça~o")) { if (inR2(w, 5)) { w = w.dropRight(5) + "u"; mark() } }
      else if (w.endsWith("ências")) { if (inR2(w, 6)) { w = w.dropRight(6) + "ente"; mark() } }
      else if (w.endsWith("ência")) { if (inR2(w, 5)) { w = w.dropRight(5) + "ente"; mark() } }
      else if (Seq("ivas", "ivos", "iva", "ivo").exists(w.endsWith)) {
        val s = if (w.endsWith("ivas") || w.endsWith("ivos")) 4 else 3
        if (inR2(w, s)) {
          w = w.dropRight(s); mark()
          if (w.endsWith("at") && inR2(w, 2)) w = w.dropRight(2)
        }
      } else if (w.endsWith("iras") && w.length >= 5 &&
        w.charAt(w.length - 5) == 'e' && inRV(w, 4)) {
        // ira(s) preceded by e -> ir
        w = w.dropRight(4) + "ir"; mark()
      } else if (w.endsWith("ira") && w.length >= 4 &&
        w.charAt(w.length - 4) == 'e' && inRV(w, 3)) {
        w = w.dropRight(3) + "ir"; mark()
      } else s1plain.find(w.endsWith) match {
        case Some(s) => if (inR2(w, s.length)) { w = w.dropRight(s.length); mark() }
        case None =>
      }

      // Step 2: verb suffixes (only if step 1 did nothing)
      var step2did = false
      if (w == original) {
        val verbs = Seq("aríamos", "eríamos", "iríamos", "ássemos", "êssemos",
          "íssemos", "aríeis", "eríeis", "iríeis", "ásseis", "ésseis",
          "ísseis", "áramos", "éramos", "íramos", "ávamos", "aremos",
          "eremos", "iremos", "ariam", "eriam", "iriam", "assem", "essem",
          "issem", "ara~o", "era~o", "ira~o", "arias", "erias", "irias",
          "ardes", "erdes", "irdes", "asses", "esses", "isses", "astes",
          "estes", "istes", "áreis", "éreis", "íreis", "áveis", "íamos",
          "armos", "ermos", "irmos", "aria", "eria", "iria", "asse", "esse",
          "isse", "aste", "este", "iste", "arei", "erei", "irei", "aram",
          "eram", "iram", "avam", "arem", "erem", "irem", "ando", "endo",
          "indo", "adas", "idas", "arás", "aras", "erás", "eras", "irás",
          "avas", "ares", "eres", "ires", "íeis", "ados", "idos", "ámos",
          "amos", "emos", "imos", "iras", "ada", "ida", "ará", "ara", "erá",
          "era", "irá", "ava", "iam", "ado", "ido", "ias", "ais", "eis",
          "ira", "ia", "ei", "am", "em", "ar", "er", "ir", "as", "es", "is",
          "eu", "iu", "ou").sortBy(-_.length)
        verbs.find(w.endsWith).foreach { s =>
          if (inRV(w, s.length)) { w = w.dropRight(s.length); step2did = true }
        }
      }

      // Step 3: i preceded by c, in RV (only if step 2 removed something)
      if (step2did && w.endsWith("i") && w.length >= 2 &&
        w.charAt(w.length - 2) == 'c' && inRV(w, 1)) w = w.dropRight(1)

      // Step 4: residual suffix (only if steps 1 and 2 did nothing)
      if (w == original) {
        Seq("os", "a", "i", "o", "á", "í", "ó").find(w.endsWith).foreach { s =>
          if (inRV(w, s.length)) w = w.dropRight(s.length)
        }
      }

      // Step 5: final e/é/ê, and gu/ci undoubling; ç -> c
      if ((w.endsWith("e") || w.endsWith("é") || w.endsWith("ê")) && inRV(w, 1)) {
        w = w.dropRight(1)
        if ((w.endsWith("gu") && inRV(w, 1)) || (w.endsWith("ci") && inRV(w, 1)))
          w = w.dropRight(1)
      }
      if (w.endsWith("ç")) w = w.dropRight(1) + "c"
      untransform(w)
    }

    private def untransform(w: String): String =
      w.replace("a~", "ã").replace("o~", "õ")
  }

  // ==================================================================
  // French — snowballstem.org/algorithms/french/stemmer.html
  // ==================================================================
  object French {
    private val vowels = "aeiouyâàëéêèïîôûù".toSet
    private def isV(c: Char) = vowels(c)

    def stem(input: String): String = {
      var w = input.toLowerCase
      if (w.length < 2) return w
      // mark u/i between vowels, y next to a vowel, u after q
      val sb = new StringBuilder(w)
      var i = 0
      while (i < sb.length) {
        val c = sb.charAt(i)
        val prevV = i > 0 && isV(sb.charAt(i - 1))
        val nextV = i < sb.length - 1 && isV(sb.charAt(i + 1))
        if (c == 'u' && i > 0 && sb.charAt(i - 1) == 'q') sb.setCharAt(i, 'U')
        else if ((c == 'u' || c == 'i') && prevV && nextV)
          sb.setCharAt(i, if (c == 'u') 'U' else 'I')
        else if (c == 'y' && (prevV || nextV)) sb.setCharAt(i, 'Y')
        i += 1
      }
      w = sb.toString

      val rv: Int = {
        if (w.length < 3) w.length
        else if (w.startsWith("par") || w.startsWith("col") || w.startsWith("tap")) 3
        else if (isV(w.charAt(0)) && isV(w.charAt(1))) 3
        else {
          var j = 1
          while (j < w.length && !isV(w.charAt(j))) j += 1
          math.min(j + 1, w.length)
        }
      }
      val r1 = standardR1(w, isV)
      val r2 = standardR2(w, r1, isV)
      def inRV(s: String, suf: Int) = s.length - suf >= rv
      def inR1(s: String, suf: Int) = s.length - suf >= r1
      def inR2(s: String, suf: Int) = s.length - suf >= r2

      val original = w
      var step1did = false
      var doStep2 = true

      // Step 1: standard suffixes (longest match governs which rule runs)
      val groups: Seq[(Seq[String], () => Unit)] = Seq(
        (Seq("issements", "issement"), () => {
          val s = if (w.endsWith("issements")) 9 else 8
          if (inR1(w, s) && w.length > s && !isV(w.charAt(w.length - s - 1))) {
            w = w.dropRight(s); step1did = true
          }
          doStep2 = false
        }),
        (Seq("atrices", "ateurs", "ations", "atrice", "ateur", "ation"), () => {
          val s = Seq("atrices", "ateurs", "ations", "atrice", "ateur", "ation")
            .find(w.endsWith).get
          if (inR2(w, s.length)) {
            w = w.dropRight(s.length); step1did = true
            if (w.endsWith("ic")) {
              if (inR2(w, 2)) w = w.dropRight(2)
              else w = w.dropRight(2) + "iqU"
            }
          }
          doStep2 = false
        }),
        (Seq("logies", "logie"), () => {
          val s = if (w.endsWith("logies")) 6 else 5
          if (inR2(w, s)) { w = w.dropRight(s) + "log"; step1did = true }
          doStep2 = false
        }),
        (Seq("usions", "utions", "usion", "ution"), () => {
          val s = if (w.endsWith("usions") || w.endsWith("utions")) 6 else 5
          if (inR2(w, s)) { w = w.dropRight(s) + "u"; step1did = true }
          doStep2 = false
        }),
        (Seq("ences", "ence"), () => {
          val s = if (w.endsWith("ences")) 5 else 4
          if (inR2(w, s)) { w = w.dropRight(s) + "ent"; step1did = true }
          doStep2 = false
        }),
        (Seq("ements", "ement"), () => {
          val s = if (w.endsWith("ements")) 6 else 5
          if (inRV(w, s)) { w = w.dropRight(s); step1did = true }
          if (step1did) {
            if (w.endsWith("iv") && inR2(w, 2)) {
              w = w.dropRight(2)
              if (w.endsWith("at") && inR2(w, 2)) w = w.dropRight(2)
            } else if (w.endsWith("eus")) {
              if (inR2(w, 3)) w = w.dropRight(3)
              else if (inR1(w, 3)) w = w.dropRight(3) + "eux"
            } else if (w.endsWith("abl") && inR2(w, 3)) w = w.dropRight(3)
            else if (w.endsWith("iqU") && inR2(w, 3)) w = w.dropRight(3)
            else if ((w.endsWith("ièr") || w.endsWith("Ièr")) && inRV(w, 3))
              w = w.dropRight(3) + "i"
          }
          doStep2 = false
        }),
        (Seq("ités", "ité"), () => {
          val s = if (w.endsWith("ités")) 4 else 3
          if (inR2(w, s)) {
            w = w.dropRight(s); step1did = true
            if (w.endsWith("abil")) {
              if (inR2(w, 4)) w = w.dropRight(4) else w = w.dropRight(4) + "abl"
            } else if (w.endsWith("ic")) {
              if (inR2(w, 2)) w = w.dropRight(2) else w = w.dropRight(2) + "iqU"
            } else if (w.endsWith("iv") && inR2(w, 2)) w = w.dropRight(2)
          }
          doStep2 = false
        }),
        (Seq("ives", "ifs", "ive", "if"), () => {
          val s = Seq("ives", "ifs", "ive", "if").find(w.endsWith).get
          if (inR2(w, s.length)) {
            w = w.dropRight(s.length); step1did = true
            if (w.endsWith("at") && inR2(w, 2)) {
              w = w.dropRight(2)
              if (w.endsWith("ic")) {
                if (inR2(w, 2)) w = w.dropRight(2) else w = w.dropRight(2) + "iqU"
              }
            }
          }
          doStep2 = false
        }),
        (Seq("eaux"), () => { w = w.dropRight(1); step1did = true; doStep2 = false }),
        (Seq("aux"), () => {
          if (inR1(w, 2)) { w = w.dropRight(2) + "l"; step1did = true }
          doStep2 = false
        }),
        (Seq("euses", "euse"), () => {
          val s = if (w.endsWith("euses")) 5 else 4
          if (inR2(w, s)) { w = w.dropRight(s); step1did = true }
          else if (inR1(w, s)) { w = w.dropRight(s) + "eux"; step1did = true }
          doStep2 = false
        }),
        (Seq("amment"), () => {
          if (inRV(w, 6)) { w = w.dropRight(6) + "ant"; step1did = false }
        }),
        (Seq("emment"), () => {
          if (inRV(w, 6)) { w = w.dropRight(6) + "ent"; step1did = false }
        }),
        (Seq("ments", "ment"), () => {
          val s = if (w.endsWith("ments")) 5 else 4
          if (w.length > s && isV(w.charAt(w.length - s - 1)) && inRV(w, s + 1)) {
            w = w.dropRight(s); step1did = false
          }
        }),
        (Seq("ances", "iqUes", "ismes", "ables", "istes", "ance", "iqUe",
          "isme", "able", "iste", "eux"), () => {
          val s = Seq("ances", "iqUes", "ismes", "ables", "istes", "ance",
            "iqUe", "isme", "able", "iste", "eux").find(w.endsWith).get
          if (inR2(w, s.length)) { w = w.dropRight(s.length); step1did = true }
          doStep2 = false
        }))
      val allSufs = groups.flatMap { case (sufs, fn) => sufs.map(_ -> fn) }
        .sortBy { case (s, _) => -s.length }
      allSufs.find { case (s, _) => w.endsWith(s) }.foreach { case (_, fn) => fn() }

      // Step 2a: verb suffixes beginning i (if step 1 left the word
      // unchanged, or matched one of amment/emment/ment(s))
      var step2did = false
      if (doStep2 || w == original) {
        if (!step1did) {
          val i2a = Seq("issaIent", "issantes", "issante", "issants", "issions",
            "iraIent", "issais", "issait", "issant", "issent", "issiez",
            "issons", "irions", "irais", "irait", "irent", "iriez", "irons",
            "iront", "isses", "issez", "îmes", "îtes", "irai", "iras", "irez",
            "isse", "ies", "ira", "ît", "ie", "ir", "is", "it", "i")
            .sortBy(-_.length)
          i2a.find(w.endsWith).foreach { s =>
            if (inRV(w, s.length) && w.length > s.length &&
              !isV(w.charAt(w.length - s.length - 1)) &&
              w.length - s.length - 1 >= rv) {
              w = w.dropRight(s.length); step2did = true
            }
          }
          // Step 2b (only if 2a removed nothing)
          if (!step2did) {
            if (w.endsWith("ions") && inR2(w, 4)) { w = w.dropRight(4); step2did = true }
            else {
              val eSufs = Seq("eraIent", "erions", "èrent", "erais", "erait",
                "eriez", "erons", "eront", "erai", "eras", "erez", "ées",
                "era", "iez", "ée", "és", "er", "ez", "é").sortBy(-_.length)
              val aSufs = Seq("assions", "assent", "assiez", "aIent", "antes",
                "asses", "âmes", "âtes", "ante", "ants", "asse", "ais", "ait",
                "ant", "ât", "ai", "as", "a").sortBy(-_.length)
              val eHit = eSufs.find(w.endsWith)
              val aHit = aSufs.find(w.endsWith)
              (eHit, aHit) match {
                case (Some(e), Some(a)) if a.length > e.length =>
                  if (inRV(w, a.length)) {
                    w = w.dropRight(a.length); step2did = true
                    if (w.endsWith("e") && inRV(w, 1)) w = w.dropRight(1)
                  }
                case (Some(e), _) =>
                  if (inRV(w, e.length)) { w = w.dropRight(e.length); step2did = true }
                case (None, Some(a)) =>
                  if (inRV(w, a.length)) {
                    w = w.dropRight(a.length); step2did = true
                    if (w.endsWith("e") && inRV(w, 1)) w = w.dropRight(1)
                  }
                case _ =>
              }
            }
          }
        }
      }

      // Step 3 / 4
      if (step1did || step2did || w != original) {
        if (w.endsWith("Y")) w = w.dropRight(1) + "i"
        else if (w.endsWith("ç")) w = w.dropRight(1) + "c"
      } else {
        // Step 4: residual
        if (w.endsWith("s") && w.length >= 2 &&
          !"aiouès".contains(w.charAt(w.length - 2))) w = w.dropRight(1)
        if (w.endsWith("ion") && inR2(w, 3) && w.length >= 4 &&
          (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
          w = w.dropRight(3)
        else if ((w.endsWith("ière") || w.endsWith("Ière")) && inRV(w, 4))
          w = w.dropRight(4) + "i"
        else if ((w.endsWith("ier") || w.endsWith("Ier")) && inRV(w, 3))
          w = w.dropRight(3) + "i"
        else if (w.endsWith("e") && inRV(w, 1)) w = w.dropRight(1)
      }

      // Step 5: undouble
      Seq("enn", "onn", "ett", "ell", "eill").foreach { d =>
        if (w.endsWith(d)) w = w.dropRight(1)
      }
      // Step 6: un-accent final é/è + consonant run
      var j = w.length - 1
      while (j >= 0 && !isV(w.charAt(j))) j -= 1
      if (j >= 0 && j < w.length - 1 && (w.charAt(j) == 'é' || w.charAt(j) == 'è'))
        w = w.substring(0, j) + "e" + w.substring(j + 1)

      w.map { case 'I' => 'i'; case 'U' => 'u'; case 'Y' => 'y'; case c => c }
    }
  }

  // ==================================================================
  // Danish — snowballstem.org/algorithms/danish/stemmer.html
  // ==================================================================
  object Danish {
    private val vowels = "aeiouyæåø".toSet
    private def isV(c: Char) = vowels(c)
    private val sEnding = "abcdfghjklmnoprtvyzå".toSet

    private val step1 = Seq("erendes", "erende", "hedens", "ethed", "erede",
      "heden", "heder", "endes", "ernes", "erens", "erets", "ered", "ende",
      "erne", "eren", "erer", "heds", "enes", "eres", "ens", "ere", "ene",
      "ers", "ets", "eret", "hed", "en", "er", "es", "et", "e").sortBy(-_.length)

    def stem(input: String): String = {
      var w = input.toLowerCase
      if (w.length < 3) return w
      var r1 = standardR1(w, isV)
      if (r1 < 3) r1 = math.min(3, w.length)
      def inR1(s: String, suf: Int) = s.length - suf >= r1

      // Step 1
      step1.find(w.endsWith) match {
        case Some(s) if inR1(w, s.length) => w = w.dropRight(s.length)
        case Some(_) => // longest match consumed, region test failed
        case None =>
          if (w.endsWith("s") && inR1(w, 1) && w.length >= 2 &&
            sEnding(w.charAt(w.length - 2))) w = w.dropRight(1)
      }
      // Step 2: gd dt gt kt -> drop last letter
      def step2(): Unit =
        if (Seq("gd", "dt", "gt", "kt").exists(w.endsWith) && inR1(w, 1))
          w = w.dropRight(1)
      step2()
      // Step 3
      if (w.endsWith("igst")) w = w.dropRight(2)
      if (w.endsWith("løst") && inR1(w, 1)) w = w.dropRight(1)
      else Seq("elig", "lig", "els", "ig").sortBy(-_.length).find(w.endsWith) match {
        case Some(s) if inR1(w, s.length) => w = w.dropRight(s.length); step2()
        case _ =>
      }
      // Step 4: undouble a final double consonant in R1
      if (w.length >= 2 && inR1(w, 1) && !isV(w.last) &&
        w.charAt(w.length - 1) == w.charAt(w.length - 2)) w = w.dropRight(1)
      w
    }
  }

  // ==================================================================
  // Norwegian — snowballstem.org/algorithms/norwegian/stemmer.html
  // ==================================================================
  object Norwegian {
    private val vowels = "aeiouyæåø".toSet
    private def isV(c: Char) = vowels(c)
    private val sEnding = "bcdfghjlmnoprtvyz".toSet

    private val step1 = Seq("hetenes", "hetene", "hetens", "heten", "heter",
      "endes", "edes", "enes", "hets", "erte", "ande", "ende", "ane", "ene",
      "ens", "ers", "ets", "het", "ast", "ert", "ede", "en", "ar", "er",
      "as", "es", "et", "a", "e").sortBy(-_.length)

    def stem(input: String): String = {
      var w = input.toLowerCase
      if (w.length < 3) return w
      var r1 = standardR1(w, isV)
      if (r1 < 3) r1 = math.min(3, w.length)
      def inR1(s: String, suf: Int) = s.length - suf >= r1

      // Step 1 (erte/ert -> er; s needs a valid s-ending)
      step1.find(w.endsWith) match {
        case Some(s) if (s == "erte" || s == "ert") && inR1(w, s.length) =>
          w = w.dropRight(s.length) + "er"
        case Some(s) if inR1(w, s.length) => w = w.dropRight(s.length)
        case Some(_) =>
        case None =>
          if (w.endsWith("s") && inR1(w, 1) && w.length >= 2) {
            val p = w.charAt(w.length - 2)
            val ok = sEnding(p) ||
              (p == 'k' && (w.length < 3 || !isV(w.charAt(w.length - 3))))
            if (ok) w = w.dropRight(1)
          }
      }
      // Step 2: dt vt -> drop last letter
      if ((w.endsWith("dt") || w.endsWith("vt")) && inR1(w, 1)) w = w.dropRight(1)
      // Step 3
      Seq("hetslov", "eleg", "elig", "elov", "slov", "leg", "eig", "lig",
        "els", "lov", "ig").sortBy(-_.length).find(w.endsWith) match {
        case Some(s) if inR1(w, s.length) => w = w.dropRight(s.length)
        case _ =>
      }
      w
    }
  }

  // ==================================================================
  // Swedish — snowballstem.org/algorithms/swedish/stemmer.html
  // ==================================================================
  object Swedish {
    private val vowels = "aeiouyäåö".toSet
    private def isV(c: Char) = vowels(c)
    private val sEnding = "bcdfghjklmnoprtvy".toSet

    private val step1 = Seq("heterna", "hetens", "anden", "heten", "heter",
      "arnas", "ernas", "ornas", "arens", "andes", "arna", "erna", "orna",
      "ande", "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern",
      "ens", "het", "ast", "andet", "ad", "en", "ar", "er", "or", "as",
      "es", "at", "a", "e").sortBy(-_.length)

    def stem(input: String): String = {
      var w = input.toLowerCase
      if (w.length < 3) return w
      var r1 = standardR1(w, isV)
      if (r1 < 3) r1 = math.min(3, w.length)
      def inR1(s: String, suf: Int) = s.length - suf >= r1

      // Step 1
      step1.find(w.endsWith) match {
        case Some(s) if inR1(w, s.length) => w = w.dropRight(s.length)
        case Some(_) =>
        case None =>
          if (w.endsWith("s") && inR1(w, 1) && w.length >= 2 &&
            sEnding(w.charAt(w.length - 2))) w = w.dropRight(1)
      }
      // Step 2: dd gd nn dt gt kt tt -> drop last letter
      if (Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt").exists(w.endsWith) &&
        inR1(w, 1)) w = w.dropRight(1)
      // Step 3
      if (w.endsWith("fullt") && inR1(w, 1)) w = w.dropRight(1)
      else if (w.endsWith("löst") && inR1(w, 1)) w = w.dropRight(1)
      else Seq("lig", "els", "ig").sortBy(-_.length).find(w.endsWith) match {
        case Some(s) if inR1(w, s.length) => w = w.dropRight(s.length)
        case _ =>
      }
      w
    }
  }

  // ==================================================================
  // Dutch — snowballstem.org/algorithms/dutch/stemmer.html
  // ==================================================================
  object Dutch {
    private val vowels = "aeiouyè".toSet
    private def isV(c: Char) = vowels(c)

    def stem(input: String): String = {
      var w = input.toLowerCase.map {
        case 'ä' | 'á' => 'a'; case 'ë' | 'é' => 'e'; case 'ï' | 'í' => 'i'
        case 'ö' | 'ó' => 'o'; case 'ü' | 'ú' => 'u'; case c => c
      }
      if (w.length < 3) return finish(w)
      // mark y at start / after vowel, and i between vowels, as consonants
      val sb = new StringBuilder(w)
      if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
      var i = 1
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (c == 'y' && isV(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
        else if (c == 'i' && i < sb.length - 1 && isV(sb.charAt(i - 1)) &&
          isV(sb.charAt(i + 1))) sb.setCharAt(i, 'I')
        i += 1
      }
      w = sb.toString
      var r1 = standardR1(w, isV)
      if (r1 < 3) r1 = math.min(3, w.length)
      val r2 = standardR2(w, standardR1(w, isV), isV)
      def inR1(s: String, suf: Int) = s.length - suf >= r1
      def inR2(s: String, suf: Int) = s.length - suf >= r2
      def undouble(): Unit =
        if (Seq("kk", "dd", "tt").exists(w.endsWith)) w = w.dropRight(1)

      // Step 1
      if (w.endsWith("heden") && inR1(w, 5)) w = w.dropRight(5) + "heid"
      else if ((w.endsWith("ene") || w.endsWith("en")) &&
        inR1(w, if (w.endsWith("ene")) 3 else 2)) {
        val n = if (w.endsWith("ene")) 3 else 2
        val stemPart = w.dropRight(n)
        if (stemPart.nonEmpty && !isV(stemPart.last) && !stemPart.endsWith("gem")) {
          w = stemPart; undouble()
        }
      } else if ((w.endsWith("se") || w.endsWith("s")) &&
        inR1(w, if (w.endsWith("se")) 2 else 1)) {
        val n = if (w.endsWith("se")) 2 else 1
        val stemPart = w.dropRight(n)
        if (stemPart.nonEmpty && !isV(stemPart.last) && stemPart.last != 'j')
          w = stemPart
      }

      // Step 2: final e after a non-vowel
      var eRemoved = false
      if (w.endsWith("e") && inR1(w, 1) && w.length >= 2 && !isV(w.charAt(w.length - 2))) {
        w = w.dropRight(1); eRemoved = true; undouble()
      }

      // Step 3a: heid
      if (w.endsWith("heid") && inR2(w, 4) &&
        !(w.length >= 5 && w.charAt(w.length - 5) == 'c')) {
        w = w.dropRight(4)
        if (w.endsWith("en") && inR1(w, 2)) {
          val stemPart = w.dropRight(2)
          if (stemPart.nonEmpty && !isV(stemPart.last) && !stemPart.endsWith("gem")) {
            w = stemPart; undouble()
          }
        }
      }

      // Step 3b: d-suffixes
      if ((w.endsWith("end") || w.endsWith("ing")) && inR2(w, 3)) {
        w = w.dropRight(3)
        if (w.endsWith("ig") && inR2(w, 2) &&
          !(w.length >= 3 && w.charAt(w.length - 3) == 'e')) w = w.dropRight(2)
        else undouble()
      } else if (w.endsWith("ig") && inR2(w, 2) &&
        !(w.length >= 3 && w.charAt(w.length - 3) == 'e')) {
        w = w.dropRight(2)
      } else if (w.endsWith("lijk") && inR2(w, 4)) {
        w = w.dropRight(4)
        if (w.endsWith("e") && inR1(w, 1) && w.length >= 2 &&
          !isV(w.charAt(w.length - 2))) { w = w.dropRight(1); undouble() }
      } else if (w.endsWith("baar") && inR2(w, 4)) {
        w = w.dropRight(4)
      } else if (w.endsWith("bar") && inR2(w, 3) && eRemoved) {
        w = w.dropRight(3)
      }

      // Step 4: undouble vowel — C + double a/e/o/u + non-I consonant
      if (w.length >= 4) {
        val d = w.last; val v2 = w.charAt(w.length - 2)
        val v1 = w.charAt(w.length - 3); val c0 = w.charAt(w.length - 4)
        if (!isV(c0) && v1 == v2 && "aeou".contains(v1) && !isV(d) && d != 'I')
          w = w.substring(0, w.length - 2) + d
      }
      finish(w)
    }

    private def finish(w: String): String =
      w.map { case 'I' => 'i'; case 'Y' => 'y'; case c => c }
  }

  // ==================================================================
  // Russian — snowballstem.org/algorithms/russian/stemmer.html
  // ==================================================================
  object Russian {
    private val vowels = "аеиоуыэюя".toSet
    private def isV(c: Char) = vowels(c)

    def stem(input: String): String = {
      var w = input.toLowerCase.replace('ё', 'е')
      if (w.isEmpty) return w
      val rv: Int = {
        var i = 0
        while (i < w.length && !isV(w.charAt(i))) i += 1
        math.min(i + 1, w.length)
      }
      val r1 = standardR1(w, isV)
      val r2 = standardR2(w, r1, isV)
      def inRV(s: String, suf: Int) = s.length - suf >= rv
      def inR2(s: String, suf: Int) = s.length - suf >= r2

      // try to remove the longest ending from `sufs`; group-1 endings
      // (those in `needAYa`) require a preceding а/я that is retained
      def removeEnding(word: String, sufs: Seq[String], needAYa: Set[String]): Option[String] = {
        val candidates = sufs.flatMap { s =>
          if (needAYa(s)) Seq(("а" + s, s.length), ("я" + s, s.length))
          else Seq((s, s.length))
        }.sortBy { case (pat, drop) => -pat.length * 100 - drop }
        candidates.collectFirst {
          case (pat, drop) if word.endsWith(pat) && word.length - pat.length >= rv =>
            word.dropRight(drop)
        }
      }

      val perfGerund1 = Set("вшись", "вши", "в")
      val perfGerund2 = Seq("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
      val adjective = Seq("ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие",
        "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их",
        "ых", "ую", "юю", "ая", "яя", "ою", "ею")
      val participle1 = Set("ем", "нн", "вш", "ющ", "щ")
      val participle2 = Seq("ивш", "ывш", "ующ")
      val verb1 = Set("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н",
        "ло", "но", "ет", "ют", "ны", "ть", "ешь", "нно")
      val verb2 = Seq("ила", "ыла", "ена", "ейте", "уйте", "ите", "или",
        "ыли", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло",
        "ено", "ят", "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь",
        "ую", "ю")
      val noun = Seq("иями", "ями", "ами", "ией", "иям", "ием", "иях", "ия",
        "ья", "ию", "ью", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям",
        "ем", "ам", "ом", "ах", "ях", "ев", "ов", "а", "е", "и", "й", "о",
        "у", "ы", "ь", "ю", "я")

      // Step 1
      removeEnding(w, perfGerund2 ++ perfGerund1.toSeq, perfGerund1) match {
        case Some(x) => w = x
        case None =>
          // reflexive
          if (w.endsWith("ся") && inRV(w, 2)) w = w.dropRight(2)
          else if (w.endsWith("сь") && inRV(w, 2)) w = w.dropRight(2)
          // adjectival
          removeEnding(w, adjective, Set.empty) match {
            case Some(x) =>
              w = x
              removeEnding(w, participle2 ++ participle1.toSeq, participle1)
                .foreach(w = _)
            case None =>
              removeEnding(w, verb2 ++ verb1.toSeq, verb1) match {
                case Some(x) => w = x
                case None => removeEnding(w, noun, Set.empty).foreach(w = _)
              }
          }
      }

      // Step 2: final и
      if (w.endsWith("и") && inRV(w, 1)) w = w.dropRight(1)

      // Step 3: derivational (in R2)
      if (w.endsWith("ость") && inR2(w, 4)) w = w.dropRight(4)
      else if (w.endsWith("ост") && inR2(w, 3)) w = w.dropRight(3)

      // Step 4
      if (w.endsWith("нн") && inRV(w, 1)) w = w.dropRight(1)
      else if (w.endsWith("ейше") && inRV(w, 4)) {
        w = w.dropRight(4)
        if (w.endsWith("нн") && inRV(w, 1)) w = w.dropRight(1)
      } else if (w.endsWith("ейш") && inRV(w, 3)) {
        w = w.dropRight(3)
        if (w.endsWith("нн") && inRV(w, 1)) w = w.dropRight(1)
      } else if (w.endsWith("ь") && inRV(w, 1)) w = w.dropRight(1)

      w
    }
  }
}
