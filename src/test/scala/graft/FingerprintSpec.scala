package graft

import graft.text.Fingerprint
import org.scalatest.funsuite.AnyFunSuite

class FingerprintSpec extends AnyFunSuite {

  test("normalize: lowercase + whitespace-run collapse, edge trim") {
    assert(Fingerprint.normalize("  Hello   WORLD\t\nfoo ") == "hello world foo")
    assert(Fingerprint.normalize("") == "")
  }

  test("fnv1a: fixed golden value (regression pin)") {
    val h = Fingerprint.fnv1a("abcdefgh", 0, 8)
    assert(h == Fingerprint.fnv1a("xabcdefghx", 1, 8)) // position-independent
    // Pin the exact value so the hash function can never silently change.
    assert(h == -3073178787292844067L, s"fnv1a drifted: $h")
  }

  test("winnow: deterministic, subset-shared for shared passages") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "PREFIX text here. the quick brown fox jumps over the lazy dog again and again. SUFFIX"
    val fa = Fingerprint.winnow(a)
    val fb = Fingerprint.winnow(b)
    assert(fa == Fingerprint.winnow(a)) // deterministic
    assert(fa.nonEmpty)
    // Most of a's fingerprints appear in b (shared passage).
    val shared = fa.count(fb.toSet)
    assert(shared >= fa.length * 7 / 10, s"$shared/${fa.length} shared")
  }

  test("winnow: short/empty inputs") {
    assert(Fingerprint.winnow("") == Vector.empty)
    assert(Fingerprint.winnow("abc") == Vector.empty) // < k chars
    assert(Fingerprint.winnow("abcdefgh").length == 1) // exactly one k-gram
  }

  test("winnow: guarantee — every ≥(k+w-1)-char run yields a selection") {
    // Windows of w consecutive k-gram hashes each select one; any text
    // with ≥ k+w-1 chars has ≥ 1 window.
    val t = "abcdefghijk" // 11 chars, k=8,w=4 → n=4 hashes, 1 window
    assert(Fingerprint.winnow(t).nonEmpty)
  }
}
