package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Varbinary encoding/hash scalars against the reference's own published
  * test vectors (behavioral spec: presto-main/src/test/.../
  * TestVarbinaryFunctions.java — the reference cites an external FNV
  * generator as its own ground truth).
  */
class BinarySpec extends AnyFunSuite {
  import BinaryExtras._

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("to_hex / from_hex round-trip, uppercase, case-insensitive parse") {
    assert(toHex(Array[Byte](0x6b, 0x19)) == "6B19")
    assert(fromHex("6b19").toSeq == Seq[Byte](0x6b, 0x19))
    assert(fromHex("6B19").toSeq == Seq[Byte](0x6b, 0x19))
    intercept[IllegalArgumentException](fromHex("ABC"))
  }

  test("fnv1/fnv1a against reference vectors") {
    assert(fnv32(Array.empty, fnv1a = false) == 0x811c9dc5L + Integer.MIN_VALUE * 2L)
    assert(fnv32(fromHex("19"), fnv1a = false) == 0x050c5d06L)
    assert(fnv32(fromHex("F5"), fnv1a = false) == 0x050c5deaL)
    assert(fnv32(fromHex("0919"), fnv1a = false) == 0x087689bbL)
    assert(fnv32(fromHex("F50919"), fnv1a = false) == 0x67a7fdecL)
    assert(fnv32(fromHex("232706FC6BF50919"), fnv1a = false)
      == 0x9f2263f3L + Integer.MIN_VALUE * 2L)
    assert(fnv64(Array.empty, fnv1a = false) == 0xcbf29ce484222325L)
    assert(fnv64(fromHex("232706FC6BF50919"), fnv1a = false) == 0x4a65ff96675a9f33L)
    assert(fnv32(fromHex("19"), fnv1a = true) == 0x1c0c8154L)
    assert(fnv32(fromHex("F5"), fnv1a = true) == 0x700b7290L)
    assert(fnv32(fromHex("0919"), fnv1a = true) == 0x34881807L)
    assert(fnv32(fromHex("F50919"), fnv1a = true)
      == 0xeb80c366L + Integer.MIN_VALUE * 2L)
    assert(fnv32(fromHex("232706FC6BF50919"), fnv1a = true) == 0x0951d55fL)
    assert(fnv64(fromHex("232706FC6BF50919"), fnv1a = true) == 0x68addc0b0febac5fL)
  }

  test("murmur3_x64_128 against reference vectors") {
    assert(toHex(murmur3x64128(Array.empty)) == "00000000000000000000000000000000")
    assert(toHex(murmur3x64128(utf8("hashme"))) == "93192FE805BE23041C8318F67EC4F2BC")
  }

  test("spooky_hash_v2 against reference vectors") {
    assert(f"${spooky64(Array.empty)}%016X" == "232706FC6BF50919")
    assert(f"${spooky64(utf8("hello"))}%016X" == "3768826AD382E6CA")
    assert(f"${spooky64(Array.empty).toInt}%08X" == "6BF50919")
    assert(f"${spooky64(utf8("hello")).toInt}%08X" == "D382E6CA")
    // long path (>= 192 bytes) at least must be deterministic and
    // length-sensitive (no published vector in the reference tests)
    val big = Array.tabulate[Byte](500)(i => (i * 31).toByte)
    assert(spooky64(big) != spooky64(big.dropRight(1)))
    assert(spooky64(big) == spooky64(big.clone))
  }

  test("key_sampling_percent is deterministic and in [0, 1)") {
    val v = keySamplingPercent("some-key")
    assert(v >= 0.0 && v < 1.0)
    assert(v == keySamplingPercent("some-key"))
    assert(keySamplingPercent("other-key") != v)
  }
}
