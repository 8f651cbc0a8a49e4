package graft

import graft.functions.Snowball

/** The round-15 Snowball tier — da, fi, nl, no, ru, sv (the reference's
  * org.tartarus map WordStemFunction.java:56-78 covers 20 ISO codes; the
  * big six landed in round 14, these are the next six by corpus
  * frequency). The reference ships NO test vectors for these languages
  * (TestWordStemFunction.java covers en/fr/es/pt/it/de only), so the
  * pins are hand-traces of the published snowballstem.org algorithm
  * descriptions — each vector was derived by applying the published
  * steps on paper, including the region-fit `among` semantics
  * (setlimit tomark pX) the Scandinavian/Finnish/Russian stemmers use.
  * The Dutch cluster (lichaam/lichamen/lichamelijk/lichamelijkheden →
  * licham) and the Danish undouble chain (bestemmelse → bestem) are the
  * published descriptions' own worked examples.
  */
class SnowballTier2Spec extends QueryAssertions {

  private def sql1(q: String): String =
    Engine.sql(spark, sfDir, q).collect()(0).getString(0)

  test("Swedish: d-suffixes, consonant clusters, step-3 endings") {
    assert(Snowball.stem("klubbarna", "sv") == "klubb")
    assert(Snowball.stem("jakten", "sv") == "jakt")
    assert(Snowball.stem("skrattade", "sv") == "skratt")
    assert(Snowball.stem("stockholmare", "sv") == "stockholm")
    assert(Snowball.stem("verkligt", "sv") == "verk") // gt→g then lig
    assert(Snowball.stem("enkelt", "sv") == "enkelt") // nothing fires
    // s only after a valid s-ending
    assert(Snowball.stem("husens", "sv") == "hus")
    // short words: R1 floor of 3 protects the stem
    assert(Snowball.stem("en", "sv") == "en")
    // step 2 deletes EXACTLY once (among semantics): dropping one d from
    // 'dd' exposes 'gd', which must NOT fire in the same pass
    assert(Snowball.stem("obygdd", "sv") == "obygd")
  }

  test("Norwegian: d-suffixes, erte→er, valid s-ending incl. the k rule") {
    assert(Snowball.stem("havnedistriktene", "no") == "havnedistrikt")
    assert(Snowball.stem("billettene", "no") == "billett")
    assert(Snowball.stem("katten", "no") == "katt") // no undouble in no
    assert(Snowball.stem("kattens", "no") == "katt")
    assert(Snowball.stem("huset", "no") == "hus")
    assert(Snowball.stem("sikkerhetene", "no") == "sikker")
    assert(Snowball.stem("hans", "no") == "han")
    // 'ærte' never textually matches the erte pattern — only e fires
    assert(Snowball.stem("lærte", "no") == "lært")
    // region-fit fallback: 'snerte' DOES end in erte, but R1 starts at
    // 4 so the 4-char suffix cannot fit (setlimit semantics) — shorter
    // candidates are still tried and e fires
    assert(Snowball.stem("snerte", "no") == "snert")
    // with R1 satisfied the same suffix rewrites to er
    assert(Snowball.stem("klamrerte", "no") == "klamrer")
  }

  test("Danish: d-suffixes, igst, els chain with the undouble step") {
    // the published description's own worked chain:
    // bestemmelse -e-> bestemmels -els-> bestemm -undouble-> bestem
    assert(Snowball.stem("bestemmelse", "da") == "bestem")
    assert(Snowball.stem("indtagelsen", "da") == "indtag")
    assert(Snowball.stem("kattens", "da") == "kat") // da undoubles
    assert(Snowball.stem("billigst", "da") == "bil") // igst→ig→(lig)
    // step 2 deletes exactly once: 'dt' drops the t, the exposed 'gd'
    // must not fire in the same pass (step 4 then undoubles nothing)
    assert(Snowball.stem("bygdt", "da") == "bygd")
  }

  test("Dutch: the published licham example cluster and e/en handling") {
    assert(Snowball.stem("lichaam", "nl") == "licham") // step-4 aa→a
    assert(Snowball.stem("lichamen", "nl") == "licham")
    assert(Snowball.stem("lichamelijk", "nl") == "licham")
    assert(Snowball.stem("lichamelijkheden", "nl") == "licham")
    // en after a vowel is NOT a valid en-ending
    assert(Snowball.stem("zeeën", "nl") == "zeeen")
    // kk undouble after en removal
    assert(Snowball.stem("bakken", "nl") == "bak")
  }

  test("Russian: noun/verb/adjective/reflexive/derivational endings") {
    assert(Snowball.stem("книгами", "ru") == "книг") // noun ами
    assert(Snowball.stem("важная", "ru") == "важн") // adjective ая
    assert(Snowball.stem("читавшись", "ru") == "чита") // perf. gerund
    assert(Snowball.stem("делала", "ru") == "дела") // verb ла after а
    assert(Snowball.stem("остановиться", "ru") == "останов") // ся+ить
    assert(Snowball.stem("значимость", "ru") == "значим") // ь + ост(R2)
    // pre-2.0 port behavior (the reference bundles Lucene 7.2.1's
    // org.tartarus stemmer): no ё→е prelude and ё is NOT a vowel, so
    // RV starts only at the first а — ами can't fit, и fires. Snowball
    // 2.0+ would give елк; the reference gives ёлкам and so do we.
    assert(Snowball.stem("ёлками", "ru") == "ёлкам")
    assert(Snowball.stem("ё", "ru") == "ё") // untouched, not a vowel
  }

  test("Finnish: case endings, possessives, plural i, tidy steps") {
    assert(Snowball.stem("taloissa", "fi") == "talo") // ssa then i
    assert(Snowball.stem("talot", "fi") == "talo") // step-5 t after vowel
    assert(Snowball.stem("kirjasta", "fi") == "kirj") // sta then tidy-b a
    assert(Snowball.stem("kirja", "fi") == "kirj") // tidy-b alone
    assert(Snowball.stem("edeltäjä", "fi") == "edeltäj") // cv fails, tidy-b
    assert(Snowball.stem("edeltäjien", "fi") == "edeltäj") // n+ie, then i
  }

  test("the SQL surface serves all twelve languages and still raises " +
      "the reference's unknown-language error") {
    assert(sql1("SELECT word_stem('klubbarna', 'sv')") == "klubb")
    assert(sql1("SELECT word_stem('книгами', 'ru')") == "книг")
    assert(sql1("SELECT word_stem('taloissa', 'fi')") == "talo")
    assert(sql1("SELECT word_stem('lichamen', 'nl')") == "licham")
    assert(sql1("SELECT word_stem('huset', 'no')") == "hus")
    assert(sql1("SELECT word_stem('bestemmelse', 'da')") == "bestem")
    val unknown = intercept[Exception](sql1("SELECT word_stem('x', 'xx')"))
    assert(unknown.getMessage.contains("Unknown stemmer language: xx"))
    // the still-unimplemented tier keeps raising loudly, never stemming
    val unimpl = intercept[Exception](sql1("SELECT word_stem('szó', 'hu')"))
    assert(unimpl.getMessage.contains("not implemented"))
  }
}
