package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Snowball

/** Hand-traced vectors for the round-16 Snowball tier: Romanian.
  *
  * Built from the PUBLISHED snowballstem.org algorithm description
  * (same policy as the tier-2 languages): the reference only CALLS
  * org.tartarus (WordStemFunction.java:55-74) and bundles no Romanian
  * vectors, so each assertion here is a step-by-step trace through the
  * published algorithm, with the step that decides the outcome named
  * in the comment. The reference's bundled port predates Snowball 2.0,
  * so the recognized spellings are the CEDILLA forms ş/ţ — the modern
  * comma-below ș/ț are unrecognized letters there and here (pinned
  * below; README divergence matrix).
  */
class SnowballTier3Spec extends AnyFunSuite {

  test("Romanian: step 0 articles and plural markers in R1") {
    // 'ului' in R1 (starts at 5 ≥ R1=3) deletes
    assert(Snowball.stem("copilului", "ro") == "copil")
    // 'ile' → 'i' (not after 'ab'), then the residual 'i' in RV drops
    assert(Snowball.stem("florile", "ro") == "flor")
    // the 'ab' guard blocks 'ile' so step 2 can see 'abile'; here R2=5
    // starts past the suffix, so 'abile' (longest match) fails its
    // region test and — among semantics — nothing shorter is retried;
    // only the residual 'e' goes
    assert(Snowball.stem("capabile", "ro") == "capabil")
    // 'aţie' → 'aţi' in R1, then the verb step's plain 'aţi' deletes
    // (step 0 does NOT arm the flag that suppresses the verb step)
    assert(Snowball.stem("operaţie", "ro") == "oper")
  }

  test("Romanian: combining suffixes repeat and arm the verb-step flag") {
    // 'abilitate' → 'abil' in R1; 'abil' then FAILS the R2 test (R2=5,
    // suffix starts at 3) so the stem keeps its shape
    assert(Snowball.stem("durabilitate", "ro") == "durabil")
    // two combo rounds: 'ivitate' → 'iv', then 'ativ' → 'at', then the
    // standard step deletes 'at' in R2
    assert(Snowball.stem("comunicativitate", "ro") == "comunic")
    // 'aţiune' → 'at' (combo), then 'at' deletes in R2
    assert(Snowball.stem("administraţiune", "ro") == "administr")
  }

  test("Romanian: standard suffixes in R2, ţiune → t") {
    // 'iune' deletes only when preceded by ţ, which becomes t; here
    // 'iune' starts at 9 ≥ R2=7
    assert(Snowball.stem("contribuţiune", "ro") == "contribut")
    // same word shape where R2 starts past 'iune': no action, residual
    // vowel only ('iune' starts at 3 < R2=6)
    assert(Snowball.stem("acţiune", "ro") == "acţiun")
    // plural goes through step 0 'ile' → 'i' to the same stem
    assert(Snowball.stem("acţiunile", "ro") == "acţiun")
  }

  test("Romanian: verb suffixes in RV with the consonant-or-u guard") {
    // 'ează' preceded in RV by the consonant r → delete
    assert(Snowball.stem("lucrează", "ro") == "lucr")
    // long infinitive 'are', same guard
    assert(Snowball.stem("lucrare", "ro") == "lucr")
    // imperfect 'eam' preceded by g
    assert(Snowball.stem("mergeam", "ro") == "merg")
    // plain (unguarded) person ending 'aţi'
    assert(Snowball.stem("cântaţi", "ro") == "cânt")
    // 'eai' fits RV ([3,7)) and its guard char n sits inside RV
    assert(Snowball.stem("spuneai", "ro") == "spun")
  }

  test("Romanian: setlimit window edges — fit fallback vs guard failure") {
    // 'se' starts at 2 < RV=3 so it cannot match inside the window;
    // 'ise' starts at 1, also out; nothing fires and only the residual
    // 'e' in RV goes
    assert(Snowball.stem("zise", "ro") == "zis")
    // 'eai' occupies exactly the RV window [3,6) so it IS the among
    // match, but its guard must read position 2 — OUTSIDE the window —
    // so the action fails, and among semantics retry nothing shorter
    // ('ai' stays): only the residual 'i' goes
    assert(Snowball.stem("citeai", "ro") == "citea")
  }

  test("Romanian: prelude marks i/u between vowels as consonants") {
    // copiii: the second i sits between vowels → I; the final residual
    // i drops in RV; postlude restores I → i
    assert(Snowball.stem("copiii", "ro") == "copii")
    // tăiai: the root i is marked I so the verb among sees plain 'ai',
    // protecting the root letter
    assert(Snowball.stem("tăiai", "ro") == "tăi")
  }

  test("Romanian: pre-2.0 spelling — cedilla recognized, comma-below not") {
    // ţ U+0163 (cedilla) drives step 0 'aţie' → verb 'aţi' → "oper";
    // ț U+021B (comma-below) matches no table entry, so only the
    // residual 'ie' drops — the reference's bundled pre-2.0 port
    // behaves identically (no comma-below normalization)
    assert(Snowball.stem("operaţie", "ro") == "oper")
    assert(Snowball.stem("operație", "ro") == "operaț")
  }

  test("Romanian no longer raises; the adjudicated tail still does") {
    assert(Snowball.stem("copilului", "ro").nonEmpty)
    for (l <- Seq("hu", "tr", "ca", "eu", "hy", "ir", "lt"))
      assertThrows[UnsupportedOperationException](Snowball.stem("szó", l))
    assertThrows[IllegalArgumentException](Snowball.stem("x", "zz"))
  }
}
