package graft.functions

/** Continuation of [[Snowball]] (file split for size): the remaining
  * languages of the reference's stemming tokenizer
  * (rs/index/src/tokenizer/stemming_tokenizer.rs:22-44) — Romanian,
  * Finnish, Hungarian, Turkish, Greek, Arabic, Tamil. Each is an
  * independent implementation written from the published algorithm
  * descriptions at snowballstem.org (public-domain algorithms); where a
  * step is simplified relative to the published description, the
  * simplification is called out in that stemmer's scaladoc. Index/query
  * symmetry holds regardless: both sides go through the same code.
  */
private[functions] object SnowballMore {

  // ==================================================================
  // Romanian — snowballstem.org/algorithms/romanian/stemmer.html
  // ==================================================================
  object Romanian {
    private val vowels = "aăâeiîou".toSet
    private def isV(c: Char) = vowels(c)

    def stem(input: String): String = {
      // modern comma-below forms normalize to the cedilla forms the
      // algorithm is written in
      var w = input.toLowerCase.map {
        case 'ș' => 'ş'; case 'ț' => 'ţ'; case c => c
      }
      if (w.length < 2) return w
      // prelude: i/u between vowels are consonants (marked I/U)
      val sb = new StringBuilder(w)
      var i = 1
      while (i < sb.length - 1) {
        val c = sb.charAt(i)
        if ((c == 'i' || c == 'u') && isV(sb.charAt(i - 1)) && isV(sb.charAt(i + 1)))
          sb.setCharAt(i, if (c == 'i') 'I' else 'U')
        i += 1
      }
      w = sb.toString
      val r1 = Snowball.standardR1(w, isV)
      val r2 = Snowball.standardR2(w, r1, isV)
      val rv = Snowball.romanceRV(w, isV)
      def inR1(s: String, n: Int) = s.length - n >= r1
      def inR2(s: String, n: Int) = s.length - n >= r2
      def inRV(s: String, n: Int) = s.length - n >= rv

      // step 0: removal of plurals (longest match, in R1)
      val step0: Seq[(String, String)] = Seq(
        "iilor" -> "i", "ului" -> "", "elor" -> "e", "iile" -> "i",
        "ilor" -> "i", "atei" -> "at", "aţie" -> "aţi", "aţia" -> "aţi",
        "aua" -> "a", "ele" -> "e", "iua" -> "i", "iei" -> "i",
        "ile" -> "i", "ul" -> "", "ea" -> "e", "ii" -> "i")
      step0.sortBy(-_._1.length).find { case (suf, _) =>
        w.endsWith(suf) && inR1(w, suf.length) &&
          !(suf == "ile" && w.dropRight(3).endsWith("ab")) // abile stays
      }.foreach { case (suf, rep) => w = w.dropRight(suf.length) + rep }

      // step 1: reduction of combining suffixes (repeat), sets the
      // standard-suffix flag consulted before step 3
      var s12 = false
      val step1: Seq[(String, String)] = Seq(
        "abilitate" -> "abil", "abilitati" -> "abil", "abilităi" -> "abil",
        "abilităţi" -> "abil", "ibilitate" -> "ibil",
        "ivitate" -> "iv", "ivitati" -> "iv", "ivităi" -> "iv", "ivităţi" -> "iv",
        "icitate" -> "ic", "icitati" -> "ic", "icităi" -> "ic", "icităţi" -> "ic",
        "icatori" -> "ic", "icator" -> "ic",
        "iciva" -> "ic", "icive" -> "ic", "icivi" -> "ic", "icivă" -> "ic", "iciv" -> "ic",
        "icala" -> "ic", "icale" -> "ic", "icali" -> "ic", "icală" -> "ic", "ical" -> "ic",
        "ativa" -> "at", "ative" -> "at", "ativi" -> "at", "ativă" -> "at", "ativ" -> "at",
        "aţiune" -> "at", "atoare" -> "at", "atori" -> "at", "ator" -> "at",
        "ătoare" -> "at", "ători" -> "at", "ător" -> "at",
        "itiva" -> "it", "itive" -> "it", "itivi" -> "it", "itivă" -> "it", "itiv" -> "it",
        "iţiune" -> "it", "itoare" -> "it", "itori" -> "it", "itor" -> "it")
      var changed = true
      while (changed) {
        changed = false
        step1.sortBy(-_._1.length).find { case (suf, _) =>
          w.endsWith(suf) && inR1(w, suf.length)
        }.foreach { case (suf, rep) =>
          w = w.dropRight(suf.length) + rep
          changed = true; s12 = true
        }
      }

      // step 2: standard suffixes, in R2
      val step2del = Seq(
        "abila", "abile", "abili", "abilă", "abil", "ibila", "ibile", "ibili",
        "ibilă", "ibil", "itate", "itati", "ităţi", "ităi", "atori", "ator",
        "oasa", "oasă", "oase", "anta", "ante", "anti", "antă", "ant",
        "ata", "ată", "ati", "ate", "at", "uta", "ută", "uti", "ute", "ut",
        "iva", "ive", "ivi", "ivă", "iv", "osi", "oşi", "os")
      val step2ist = Seq("isme", "ista", "iste", "isti", "istă", "işti", "ism", "ist")
      val allStep2 = step2del.map(s => (s, "", 0)) ++
        step2ist.map(s => (s, "ist", 1)) ++ Seq(("iune", "", 2), ("iuni", "", 2))
      allStep2.sortBy(-_._1.length).find { case (suf, _, kind) =>
        w.endsWith(suf) && inR2(w, suf.length) &&
          (kind != 2 || w.dropRight(suf.length).endsWith("ţ"))
      }.foreach { case (suf, rep, kind) =>
        w = w.dropRight(suf.length) + rep
        if (kind == 2) w = w.dropRight(1) + "t" // ţiune -> t
        s12 = true
      }

      // step 3: verb suffixes in RV, only if steps 1-2 removed nothing
      if (!s12) {
        val g1 = Seq( // delete if preceded by consonant or u
          "aserăţi", "aserăm", "iserăţi", "iserăm", "âserăţi", "âserăm",
          "userăţi", "userăm", "irăţi", "urăţi", "arăţi", "ârăţi",
          "aseşi", "iseşi", "âseşi", "useşi", "asem", "isem", "âsem", "usem",
          "aseră", "iseră", "âseră", "useră", "irăm", "urăm", "arăm", "ârăm",
          "ească", "ează", "eaţi", "iaţi", "indu", "ându", "eşti", "eşte",
          "ăşti", "ăşte", "eze", "ind", "ând", "are", "ere", "ire", "âre",
          "aşi", "uşi", "işi", "âşi", "ase", "ise", "âse", "use",
          "ară", "ură", "iră", "âră", "eam", "eai", "eau", "iam", "iai", "iau",
          "esc", "ăsc", "ez", "ezi", "ea", "ia", "ui", "âi", "am", "ai", "au")
        val g2 = Seq( // delete unconditionally
          "seserăţi", "seserăm", "seseşi", "sesem", "seseră", "sese",
          "serăţi", "serăm", "seră", "seşi", "sei", "se",
          "aţi", "eţi", "iţi", "âţi", "ăm", "em", "im", "âm")
        val all3 = g1.map((_, true)) ++ g2.map((_, false))
        all3.sortBy(-_._1.length).find { case (suf, cond) =>
          w.endsWith(suf) && inRV(w, suf.length) && (!cond || {
            val pre = w.length - suf.length - 1
            pre >= 0 && (w.charAt(pre) == 'u' || !isV(w.charAt(pre)) ||
              w.charAt(pre) == 'U' || w.charAt(pre) == 'I')
          })
        }.foreach { case (suf, _) => w = w.dropRight(suf.length) }
      }

      // step 4: final vowel, in RV
      Seq("ie", "a", "e", "i", "ă").find(s => w.endsWith(s) && inRV(w, s.length))
        .foreach(s => w = w.dropRight(s.length))

      w.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
    }
  }

  // ==================================================================
  // Finnish — snowballstem.org/algorithms/finnish/stemmer.html
  // ==================================================================
  object Finnish {
    private val vowels = "aeiouyäö".toSet
    private def isV(c: Char) = vowels(c)
    private val restricted = "aeiouäö" // V in the Vi / hVn conditions
    private def isLongV(s: String): Boolean =
      s.length >= 2 && s(s.length - 1) == s(s.length - 2) &&
        restricted.contains(s(s.length - 1))

    def stem(input: String): String = {
      var w = input.toLowerCase
      if (w.length < 2) return w
      val r1 = Snowball.standardR1(w, isV)
      val r2 = Snowball.standardR2(w, r1, isV)
      def inR1(s: String, n: Int) = s.length - n >= r1
      def inR2(s: String, n: Int) = s.length - n >= r2

      // step 1: particles etc.
      val particles = Seq("kaan", "kään", "han", "hän", "kin", "ko", "kö", "pa", "pä")
      particles.sortBy(-_.length).find { p =>
        w.endsWith(p) && inR1(w, p.length) && {
          val pre = w.length - p.length - 1
          pre >= 0 && (w.charAt(pre) == 'n' || w.charAt(pre) == 't' || isV(w.charAt(pre)))
        }
      }.foreach(p => w = w.dropRight(p.length))
      if (w.endsWith("sti") && inR2(w, 3)) w = w.dropRight(3)

      // step 2: possessives, in R1
      if (w.endsWith("si") && inR1(w, 2)) {
        if (!(w.length >= 3 && w.charAt(w.length - 3) == 'k')) w = w.dropRight(2)
      } else if (w.endsWith("ni") && inR1(w, 2)) {
        w = w.dropRight(2)
        if (w.endsWith("kse")) w = w.dropRight(1) + "i"
      } else if ((w.endsWith("nsa") || w.endsWith("nsä")) && inR1(w, 3)) {
        w = w.dropRight(3)
      } else if ((w.endsWith("mme") || w.endsWith("nne")) && inR1(w, 3)) {
        w = w.dropRight(3)
      } else if (w.endsWith("an") && inR1(w, 2) &&
        Seq("ta", "ssa", "sta", "lla", "lta", "na").exists(w.dropRight(2).endsWith)) {
        w = w.dropRight(2)
      } else if (w.endsWith("än") && inR1(w, 2) &&
        Seq("tä", "ssä", "stä", "llä", "ltä", "nä").exists(w.dropRight(2).endsWith)) {
        w = w.dropRight(2)
      } else if (w.endsWith("en") && inR1(w, 2) &&
        Seq("lle", "ine").exists(w.dropRight(2).endsWith)) {
        w = w.dropRight(2)
      }

      // step 3: cases — longest textual match in R1 wins, then its
      // condition decides (Snowball `among` semantics)
      var caseRemoved = false
      val hVn = Seq("han", "hen", "hin", "hon", "hun", "hyn", "hän", "hön")
      case class CaseRule(suf: String, ok: String => Boolean)
      val step3: Seq[CaseRule] =
        hVn.map(s => CaseRule(s, stem => {
          val pre = stem.length - s.length - 1
          pre >= 0 && stem.charAt(pre) == s.charAt(1) // matching vowel: ahan, ehen...
        })) ++
        Seq("siin", "den", "tten").map(s => CaseRule(s, stem => {
          val pre = stem.length - s.length
          pre >= 2 && stem.charAt(pre - 1) == 'i' && restricted.contains(stem.charAt(pre - 2))
        })) ++
        Seq(CaseRule("seen", stem => isLongV(stem.dropRight(4)))) ++
        Seq("tta", "ttä").map(s => CaseRule(s, stem => {
          val pre = stem.length - s.length - 1
          pre >= 0 && stem.charAt(pre) == 'e'
        })) ++
        Seq("ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä", "lle",
          "ksi", "ine", "na", "nä", "ta", "tä").map(s => CaseRule(s, _ => true)) ++
        Seq("a", "ä").map(s => CaseRule(s, stem => {
          val n = stem.length
          n >= 3 && !isV(stem.charAt(n - 2)) && isV(stem.charAt(n - 3))
        })) ++
        Seq(CaseRule("n", _ => true))
      step3.filter(r => w.endsWith(r.suf) && inR1(w, r.suf.length))
        .sortBy(-_.suf.length).headOption.foreach { r =>
        if (r.ok(w)) {
          w = w.dropRight(r.suf.length)
          if (r.suf == "n" && (isLongV(w) || w.endsWith("ie"))) w = w.dropRight(1)
          caseRemoved = true
        }
      }

      // step 4: other endings, in R2
      val mpNoPo = Seq("mpi", "mpa", "mpä", "mmi", "mma", "mmä")
      val plain4 = Seq("impi", "impa", "impä", "immi", "imma", "immä", "eja", "ejä")
      (mpNoPo.map((_, true)) ++ plain4.map((_, false)))
        .filter { case (s, _) => w.endsWith(s) && inR2(w, s.length) }
        .sortBy(-_._1.length).headOption.foreach { case (s, noPo) =>
          if (!noPo || !w.dropRight(s.length).endsWith("po")) w = w.dropRight(s.length)
        }

      // step 5: plurals
      if (caseRemoved) {
        if ((w.endsWith("i") || w.endsWith("j")) && inR1(w, 1)) w = w.dropRight(1)
      } else if (w.endsWith("t") && inR1(w, 1) &&
        w.length >= 2 && isV(w.charAt(w.length - 2))) {
        w = w.dropRight(1)
        if (w.endsWith("imma") && inR2(w, 4)) w = w.dropRight(4)
        else if (w.endsWith("mma") && inR2(w, 3) && !w.dropRight(3).endsWith("po"))
          w = w.dropRight(3)
      }

      // step 6: tidying (a-d in R1; e on the whole word)
      if (inR1(w, 1) && isLongV(w)) w = w.dropRight(1) // a) LV
      if (inR1(w, 1) && w.length >= 2 && "aäei".contains(w.last) &&
        !isV(w.charAt(w.length - 2))) w = w.dropRight(1) // b) cX
      if (inR1(w, 1) && (w.endsWith("oj") || w.endsWith("uj"))) w = w.dropRight(1) // c)
      if (inR1(w, 1) && w.endsWith("jo")) w = w.dropRight(1) // d)
      // e) final double consonant (possibly before trailing vowels)
      var k = w.length - 1
      while (k >= 0 && isV(w.charAt(k))) k -= 1
      if (k >= 1 && !isV(w.charAt(k)) && w.charAt(k) == w.charAt(k - 1))
        w = w.substring(0, k) + w.substring(k + 1)
      w
    }
  }

  // ==================================================================
  // Hungarian — snowballstem.org/algorithms/hungarian/stemmer.html
  // The owned-object step (step 6) is simplified to its common forms;
  // everything else follows the published step list and order.
  // ==================================================================
  object Hungarian {
    private val vowels = "aáeéiíoóöőuúüű".toSet
    private def isV(c: Char) = vowels(c)
    private val digraphs = Seq("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")

    /** R1: word starts with a vowel -> after the first consonant or
      * digraph; starts with a consonant -> after the first vowel. */
    private def regionR1(w: String): Int = {
      if (w.isEmpty) return 0
      if (isV(w.charAt(0))) {
        var i = 1
        while (i < w.length && isV(w.charAt(i))) i += 1
        if (i >= w.length) return w.length
        // consonant found at i; a digraph counts as one consonant
        val d = digraphs.find(dg => w.startsWith(dg, i))
        i + d.map(_.length).getOrElse(1)
      } else {
        var i = 1
        while (i < w.length && !isV(w.charAt(i))) i += 1
        math.min(i + 1, w.length)
      }
    }

    private def isDoubleCons(w: String): Boolean = {
      // double consonant at the end: bb..zz or doubled digraph (ssz, nny...)
      val n = w.length
      if (n >= 2 && !isV(w.charAt(n - 1)) && w.charAt(n - 1) == w.charAt(n - 2)) true
      else digraphs.exists(d => n >= d.length + 1 &&
        w.endsWith(d) && w.charAt(n - d.length - 1) == d.charAt(0))
    }

    private def undouble(w: String): String = {
      val n = w.length
      digraphs.find(d => n >= d.length + 1 && w.endsWith(d) &&
        w.charAt(n - d.length - 1) == d.charAt(0)) match {
        case Some(_) => w.substring(0, n - 1) // ssz -> sz (drop one letter)
        case None if n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) => w.dropRight(1)
        case None => w
      }
    }

    private def vTail(w: String): String =
      if (w.endsWith("á")) w.dropRight(1) + "a"
      else if (w.endsWith("é")) w.dropRight(1) + "e"
      else w

    def stem(input: String): String = {
      var w = input.toLowerCase
      if (w.length < 3) return w
      val r1 = regionR1(w)
      def inR1(s: String, n: Int) = s.length - n >= r1
      def strip(sufs: Seq[(String, String)]): Boolean = {
        val hit = sufs.sortBy(-_._1.length).find { case (s, _) =>
          w.endsWith(s) && inR1(w, s.length)
        }
        hit.foreach { case (s, rep) => w = w.dropRight(s.length) + rep }
        hit.isDefined
      }

      // 1. instrumental: al/el after a double consonant, then undouble
      if ((w.endsWith("al") || w.endsWith("el")) && inR1(w, 2) &&
        isDoubleCons(w.dropRight(2))) w = undouble(w.dropRight(2))
      // 2. frequent cases
      if (strip(Seq("onként", "enként", "anként", "képpen", "képp", "ként",
        "ban", "ben", "nak", "nek", "val", "vel", "tól", "től", "ról", "ről",
        "ból", "ből", "hoz", "hez", "höz", "nál", "nél", "ért", "kor",
        "ba", "be", "ra", "re", "ig", "at", "et", "ot", "öt", "ul", "ül",
        "vá", "vé", "en", "on", "an", "ön", "n", "t").map((_, ""))))
        w = vTail(w)
      // 3. special cases
      strip(Seq("ánként" -> "a", "án" -> "a", "én" -> "e"))
      // 4. other cases
      strip(Seq("ástul" -> "a", "éstül" -> "e",
        "astul" -> "", "estül" -> "", "stul" -> "", "stül" -> ""))
      // 5. factive: á/é after double consonant, then undouble
      if ((w.endsWith("á") || w.endsWith("é")) && inR1(w, 1) &&
        isDoubleCons(w.dropRight(1))) w = undouble(w.dropRight(1))
      // 6. owned (simplified to the common forms)
      strip(Seq("áké" -> "a", "éké" -> "e", "öké" -> "", "oké" -> "",
        "aké" -> "", "eké" -> "", "uké" -> "", "üké" -> "",
        "áéi" -> "a", "ééi" -> "e", "éi" -> "", "é" -> ""))
      // 7. singular owner
      strip(Seq("ánk" -> "a", "énk" -> "e", "ám" -> "a", "ém" -> "e",
        "ád" -> "a", "éd" -> "e", "ünk" -> "", "unk" -> "", "juk" -> "",
        "jük" -> "", "uk" -> "", "ük" -> "", "em" -> "", "om" -> "",
        "am" -> "", "od" -> "", "ed" -> "", "ad" -> "", "öd" -> "",
        "ja" -> "", "je" -> "", "nk" -> "", "m" -> "", "d" -> "",
        "a" -> "", "e" -> "", "o" -> ""))
      // 8. plural owner
      strip(Seq("jaitok" -> "", "jeitek" -> "", "aitok" -> "", "eitek" -> "",
        "áik" -> "a", "éik" -> "e", "jaink" -> "", "jeink" -> "",
        "aink" -> "", "eink" -> "", "jaim" -> "", "jeim" -> "",
        "aim" -> "", "eim" -> "", "jaid" -> "", "jeid" -> "",
        "aid" -> "", "eid" -> "", "jai" -> "", "jei" -> "",
        "itek" -> "", "jeik" -> "", "jaik" -> "", "aik" -> "", "eik" -> "",
        "ink" -> "", "ai" -> "", "ei" -> "", "im" -> "", "id" -> "",
        "ik" -> "", "i" -> ""))
      // 9. plural
      strip(Seq("ák" -> "a", "ék" -> "e", "ök" -> "", "ok" -> "",
        "ek" -> "", "ak" -> "", "k" -> ""))
      w
    }
  }

  // ==================================================================
  // Turkish — snowballstem.org/algorithms/turkish/stemmer.html
  // Structured after the published algorithm (Cilden): nominal-verb
  // suffix classes then noun suffix classes, outermost (case) first,
  // every strip gated on vowel harmony with the remaining stem, then
  // final-consonant devoicing (b/c/d/ğ -> p/ç/t/k). The published
  // suffix-chain grammar is approximated by ordered single-pass
  // classes; y/n/s buffer consonants ride as expanded variants.
  // ==================================================================
  object Turkish {
    private val vowels = "aeıioöuü".toSet
    private def isV(c: Char) = vowels(c)

    private def lastVowel(s: String): Option[Char] = {
      var i = s.length - 1
      while (i >= 0) { if (isV(s.charAt(i))) return Some(s.charAt(i)); i -= 1 }
      None
    }

    /** Two-fold (a/e) and four-fold (ı/i/u/ü) vowel harmony: the suffix's
      * first vowel must agree with the last vowel of the remaining stem. */
    private def harmonic(stemLast: Option[Char], sufVowel: Char): Boolean =
      stemLast match {
        case None => false
        case Some(p) => sufVowel match {
          case 'a' => "aıou".contains(p)
          case 'e' => "eiöü".contains(p)
          case 'ı' => "aı".contains(p)
          case 'i' => "ei".contains(p)
          case 'u' => "ou".contains(p)
          case 'ü' => "öü".contains(p)
          case _ => true
        }
      }

    private def firstVowelOf(s: String): Option[Char] = s.find(isV)

    // classes in strip order; within a class, longest variant first
    private val verbClasses: Seq[Seq[String]] = Seq(
      Seq("casına", "cesine"),
      Seq("ymış", "ymiş", "ymuş", "ymüş", "mış", "miş", "muş", "müş"),
      Seq("ydı", "ydi", "ydu", "ydü", "dı", "di", "du", "dü", "tı", "ti", "tu", "tü"),
      Seq("ysa", "yse", "sa", "se"),
      Seq("yken", "ken"),
      Seq("sınız", "siniz", "sunuz", "sünüz"),
      Seq("yım", "yim", "yum", "yüm", "ım", "im", "um", "üm"),
      Seq("sın", "sin", "sun", "sün"),
      Seq("yız", "yiz", "yuz", "yüz", "ız", "iz", "uz", "üz"),
      Seq("dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür"))
    private val nounClasses: Seq[Seq[String]] = Seq(
      Seq("ndan", "nden", "dan", "den", "tan", "ten"), // ablative
      Seq("nda", "nde", "da", "de", "ta", "te"), // locative
      Seq("yla", "yle", "la", "le"), // instrumental
      Seq("ki", "kü"), // relative
      Seq("nın", "nin", "nun", "nün", "ın", "in", "un", "ün"), // genitive
      Seq("ya", "ye", "na", "ne"), // dative (buffered)
      Seq("ları", "leri"), // plural possessive
      Seq("ımız", "imiz", "umuz", "ümüz", "mız", "miz", "muz", "müz"),
      Seq("sı", "si", "su", "sü", "ı", "i", "u", "ü"), // 3sg possessive
      Seq("lar", "ler")) // plural
    // the unbuffered dative (bare a/e) is deliberately NOT stripped: it is
    // indistinguishable from a lexical final vowel (araba, kafa) and the
    // buffered ya/ye form covers the productive case

    private def stripClasses(word: String, classes: Seq[Seq[String]]): String = {
      var w = word
      classes.foreach { variants =>
        variants.sortBy(-_.length).find { s =>
          w.length - s.length >= 2 && w.endsWith(s) && {
            val rest = w.dropRight(s.length)
            firstVowelOf(s).forall(v => harmonic(lastVowel(rest), v))
          }
        }.foreach(s => w = w.dropRight(s.length))
      }
      w
    }

    def stem(input: String): String = {
      var w = input.toLowerCase
      if (w.length < 3) return w
      w = stripClasses(w, verbClasses)
      w = stripClasses(w, nounClasses)
      // post-process: undo final-consonant voicing introduced by suffixation
      if (w.nonEmpty) w.last match {
        case 'b' => w = w.dropRight(1) + "p"
        case 'c' => w = w.dropRight(1) + "ç"
        case 'd' => w = w.dropRight(1) + "t"
        case 'ğ' => w = w.dropRight(1) + "k"
        case _ =>
      }
      w
    }
  }

  // ==================================================================
  // Greek — snowballstem.org/algorithms/greek/stemmer.html (Ntais'
  // algorithm). Normalization + the irregular-noun table + the
  // productive suffix rules; the per-rule re-append exception word
  // lists are reduced to the rules' structural core (index/query
  // symmetry makes the reduction self-consistent).
  // ==================================================================
  object Greek {
    private val vowels = "αεηιουω".toSet

    private def normalize(input: String): String =
      input.toLowerCase.map {
        case 'ά' => 'α'; case 'έ' => 'ε'; case 'ή' => 'η'; case 'ί' => 'ι'
        case 'ό' => 'ο'; case 'ύ' => 'υ'; case 'ώ' => 'ω'
        case 'ϊ' => 'ι'; case 'ϋ' => 'υ'; case 'ΐ' => 'ι'; case 'ΰ' => 'υ'
        case 'ς' => 'σ'
        case c => c
      }

    // rule 1: irregular nouns (exact table from the published algorithm)
    private val irregular: Seq[(String, String)] = Seq(
      "φαγια" -> "φα", "φαγιου" -> "φα", "φαγιων" -> "φα",
      "σκαγια" -> "σκα", "σκαγιου" -> "σκα", "σκαγιων" -> "σκα",
      "ολογιου" -> "ολο", "ολογια" -> "ολο", "ολογιων" -> "ολο",
      "σογιου" -> "σο", "σογια" -> "σο", "σογιων" -> "σο",
      "τατογια" -> "τατο", "τατογιου" -> "τατο", "τατογιων" -> "τατο",
      "κρεασ" -> "κρε", "κρεατοσ" -> "κρε", "κρεατα" -> "κρε", "κρεατων" -> "κρε",
      "περασ" -> "περ", "περατοσ" -> "περ", "περατα" -> "περ", "περατων" -> "περ",
      "τερασ" -> "τερ", "τερατοσ" -> "τερ", "τερατα" -> "τερ", "τερατων" -> "τερ",
      "φωσ" -> "φω", "φωτοσ" -> "φω", "φωτα" -> "φω", "φωτων" -> "φω",
      "καθεστωσ" -> "καθεστ", "καθεστωτοσ" -> "καθεστ",
      "καθεστωτα" -> "καθεστ", "καθεστωτων" -> "καθεστ",
      "γεγονοσ" -> "γεγον", "γεγονοτοσ" -> "γεγον",
      "γεγονοτα" -> "γεγον", "γεγονοτων" -> "γεγον")

    // noun-family suffix rules (strip, keep the family stem)
    private val familyRules: Seq[(String, String)] = Seq(
      "ματων" -> "μα", "ματοσ" -> "μα", "ματα" -> "μα",
      "ουδων" -> "ουδ", "ουδεσ" -> "ουδ",
      "αδων" -> "αδ", "αδεσ" -> "αδ", "εδων" -> "εδ", "εδεσ" -> "εδ",
      "εων" -> "ε", "εωσ" -> "ε")

    // comparatives (rule 22)
    private val comparatives =
      Seq("εστερ", "εστατ", "οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")

    // the general inflectional strip (rule 21's suffix list, productive
    // core, longest match), requiring >= 3 letters of stem
    private val inflections: Seq[String] = Seq(
      "ιοντουσαν", "οντουσαν", "ιομασταν", "ιοσασταν", "ομασταν", "οσασταν",
      "ηθηκατε", "ηθηκαμε", "ηθηκαν", "ηθηκεσ", "ηθηκα", "ηθηκε",
      "ηθουμε", "ηθειτε", "ιομουνα", "ιοσουνα", "ιουνται", "ιουνταν",
      "ουμαστε", "ιομαστε", "ομαστε", "ιεμαι", "ιεσαι", "ιεται", "ιεστε",
      "ουσαμε", "ουσατε", "ουσαν", "ουσεσ", "ουσα", "ουσε",
      "ησουμε", "ησουνε", "ησατε", "ησαμε", "ησαν", "ησεσ", "ησα", "ησε", "ησου",
      "ηκαμε", "ηκατε", "ηκαν", "ηκεσ", "ηκα", "ηκε",
      "αγαμε", "αγατε", "αγαν", "αγεσ", "αγα", "αγε",
      "ουνται", "ουνταν", "ονται", "ονταν", "οντασ", "ωντασ",
      "ομουν", "οσουν", "οταν", "αμαι", "ασαι", "αται", "εσαι", "εται",
      "ειτε", "ουμε", "ουνε", "ετε", "ηδων", "ηδεσ",
      "αει", "αν", "ασ", "αω", "ουσ", "ουν", "ου",
      "εισ", "ει", "εσ", "ησ", "ισ", "οσ", "υσ", "ωσ",
      "ων", "οι", "αι", "α", "ε", "η", "ι", "ο", "υ", "ω")

    def stem(input: String): String = {
      var w = normalize(input)
      if (w.length < 3) return w
      irregular.sortBy(-_._1.length).find(r => w == r._1) match {
        case Some((_, rep)) => return rep
        case None =>
      }
      familyRules.sortBy(-_._1.length).find { case (suf, _) =>
        w.endsWith(suf) && w.length - suf.length >= 2
      } match {
        case Some((suf, rep)) => w = w.dropRight(suf.length) + rep
        case None =>
          inflections.sortBy(-_.length).find { suf =>
            w.endsWith(suf) && w.length - suf.length >= 3 &&
              w.dropRight(suf.length).exists(vowels) // stem keeps a vowel
          }.foreach(suf => w = w.dropRight(suf.length))
      }
      comparatives.find(s => w.endsWith(s) && w.length - s.length >= 2)
        .foreach(s => w = w.dropRight(s.length))
      w
    }
  }

  // ==================================================================
  // Arabic — normalization per the Snowball Arabic stemmer plus the
  // standard light prefix/suffix classes (Larkey et al.'s published
  // Light10, which the Snowball stemmer's affix tables subsume).
  // ==================================================================
  object Arabic {
    def stem(input: String): String = {
      // strip harakat (tashkeel), superscript alef and tatweel
      var w = input.filterNot(c =>
        (c >= 'ً' && c <= 'ْ') || c == 'ٰ' || c == 'ـ')
      // normalize alef variants; final alef maqsura -> yeh; final teh
      // marbuta -> heh
      w = w.map { case 'أ' | 'إ' | 'آ' => 'ا'; case c => c }
      if (w.endsWith("ى")) w = w.dropRight(1) + "ي"
      if (w.endsWith("ة")) w = w.dropRight(1) + "ه"
      if (w.length <= 3) return w
      // waw conjunction: strip a leading و when >= 4 letters remain
      if (w.startsWith("و") && w.length >= 5) w = w.substring(1)
      // definite-article prefixes (longest first), >= 3 letters remaining
      val prefixes = Seq("وال", "فال", "بال", "كال", "لل", "ال")
      prefixes.find(p => w.startsWith(p) && w.length - p.length >= 3)
        .foreach(p => w = w.substring(p.length))
      // suffixes, stripped repeatedly while >= 3 letters remain
      val suffixes = Seq("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ي")
      var changed = true
      while (changed) {
        changed = false
        suffixes.find(s => w.endsWith(s) && w.length - s.length >= 3).foreach { s =>
          w = w.dropRight(s.length); changed = true
        }
      }
      w
    }
  }

  // ==================================================================
  // Tamil — the main suffix classes of the published Snowball Tamil
  // stemmer (Damodharan): clitics, plural, case endings, then common
  // tense endings, each stripped once (longest match) with a minimum
  // stem guard. The full algorithm's pronoun-prefix and sandhi steps
  // are omitted (documented simplification).
  // ==================================================================
  object Tamil {
    private val classes: Seq[Seq[String]] = Seq(
      // interrogative / emphatic clitics
      Seq("ும்", "ா", "ே", "ோ"),
      // plural (with sandhi doublings)
      Seq("க்கள்", "ங்கள்", "கள்"),
      // case endings
      Seq("ிலிருந்து", "ுக்காக", "ுடைய", "ுக்கு", "ிடம்", "ுடன்",
        "ோடு", "ால்", "ில்", "ின்", "ை"),
      // common tense/person endings
      Seq("கிறார்கள்", "கிறீர்கள்", "ந்தார்கள்", "கின்றன", "கிறான்",
        "கிறாள்", "கிறார்", "கிறேன்", "கிறோம்", "கிறது", "ந்தான்",
        "ந்தாள்", "ந்தார்", "ந்தேன்", "ந்தோம்", "ந்தது", "வான்",
        "வாள்", "வார்", "வேன்", "வோம்", "ட்டும்"))

    def stem(input: String): String = {
      var w = input
      if (w.length < 3) return w
      classes.foreach { variants =>
        variants.sortBy(-_.length).find { s =>
          w.endsWith(s) && w.length - s.length >= 2
        }.foreach(s => w = w.dropRight(s.length))
      }
      w
    }
  }
}
