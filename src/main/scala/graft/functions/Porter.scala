package graft.functions

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980 — public algorithm), implemented from
  * the paper's rule tables. This is the behavior behind the reference's
  * word_stem (reference: presto-main/.../operator/scalar/
  * WordStemFunction.java, which wraps a Porter ("english") snowball
  * stemmer for the no-language form).
  */
object Porter {

  def stem(word: String): String = {
    if (word == null) return null
    val w = word.toLowerCase
    if (w.length < 3 || !w.forall(c => c >= 'a' && c <= 'z')) return w
    step5(step4(step3(step2(step1c(step1b(step1a(w)))))))
  }

  private def isCons(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(s, i - 1)
    case _ => true
  }

  /** m = number of VC sequences in [C](VC)^m[V]. */
  private def measure(s: String): Int = {
    var m = 0
    var i = 0
    val n = s.length
    while (i < n && isCons(s, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(s, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && isCons(s, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(s: String): Boolean =
    (0 until s.length).exists(i => !isCons(s, i))

  private def endsDoubleCons(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      isCons(s, s.length - 1)

  /** *o condition: stem ends cvc where the final c is not w, x or y. */
  private def cvc(s: String): Boolean =
    s.length >= 3 &&
      isCons(s, s.length - 3) && !isCons(s, s.length - 2) &&
      isCons(s, s.length - 1) && !"wxy".contains(s.charAt(s.length - 1))

  /** Apply the first matching (suffix → replacement) whose remaining stem
    * satisfies `cond`; None if no suffix matched at all. */
  private def replace(
      s: String, rules: Seq[(String, String)],
      cond: String => Boolean): Option[String] =
    rules.collectFirst {
      case (suf, rep) if s.endsWith(suf) =>
        val stem = s.dropRight(suf.length)
        if (cond(stem)) Some(stem + rep) else None
    }.map(_.getOrElse(s))

  private def step1a(s: String): String =
    if (s.endsWith("sses")) s.dropRight(2)
    else if (s.endsWith("ies")) s.dropRight(2)
    else if (s.endsWith("ss")) s
    else if (s.endsWith("s")) s.dropRight(1)
    else s

  private def step1b(s: String): String = {
    if (s.endsWith("eed")) {
      if (measure(s.dropRight(3)) > 0) s.dropRight(1) else s
    } else {
      val stripped =
        if (s.endsWith("ed") && hasVowel(s.dropRight(2))) Some(s.dropRight(2))
        else if (s.endsWith("ing") && hasVowel(s.dropRight(3))) Some(s.dropRight(3))
        else None
      stripped match {
        case None => s
        case Some(t) =>
          if (t.endsWith("at") || t.endsWith("bl") || t.endsWith("iz")) t + "e"
          else if (endsDoubleCons(t) && !"lsz".contains(t.last)) t.dropRight(1)
          else if (measure(t) == 1 && cvc(t)) t + "e"
          else t
      }
    }
  }

  private def step1c(s: String): String =
    if (s.endsWith("y") && hasVowel(s.dropRight(1))) s.dropRight(1) + "i" else s

  private val step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private def step2(s: String): String =
    replace(s, step2Rules, measure(_) > 0).getOrElse(s)

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def step3(s: String): String =
    replace(s, step3Rules, measure(_) > 0).getOrElse(s)

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(s: String): String =
    step4Suffixes.collectFirst {
      case suf if s.endsWith(suf) =>
        val stem = s.dropRight(suf.length)
        val ok = measure(stem) > 1 &&
          (suf != "ion" || (stem.nonEmpty && "st".contains(stem.last)))
        if (ok) stem else s
    }.getOrElse(s)

  private def step5(s: String): String = {
    val a =
      if (s.endsWith("e")) {
        val stem = s.dropRight(1)
        val m = measure(stem)
        if (m > 1 || (m == 1 && !cvc(stem))) stem else s
      } else s
    if (a.endsWith("ll") && measure(a) > 1) a.dropRight(1) else a
  }
}
