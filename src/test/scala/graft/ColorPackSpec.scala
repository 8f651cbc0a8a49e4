package graft

import graft.functions.ColorPack
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the color scalars (reference: presto-main/.../operator/
  * scalar/ColorFunctions.java): encoded COLOR values, ANSI framing, HSB
  * interpolation corners and the red→green midpoint, bar geometry. The
  * e10 corpus entry replays the SQL-expressible parts against DuckDB.
  */
class ColorPackSpec extends AnyFunSuite {

  test("color parse: #rgb nibble replication and system names") {
    assert(ColorPack.parseColor("#f00") == 0xFF0000L)
    assert(ColorPack.parseColor("#fff") == 0xFFFFFFL)
    assert(ColorPack.parseColor("#111") == 0x111111L)
    assert(ColorPack.parseColor("black") == -1L)
    assert(ColorPack.parseColor("red") == -2L)
    assert(ColorPack.parseColor("WHITE") == -8L) // case-insensitive
    intercept[IllegalArgumentException](ColorPack.parseColor("#ff0000"))
    intercept[IllegalArgumentException](ColorPack.parseColor("mauve"))
  }

  test("rgb packs and range-checks") {
    assert(ColorPack.rgb(255, 0, 0) == 0xFF0000L)
    assert(ColorPack.rgb(1, 2, 3) == 0x010203L)
    intercept[IllegalArgumentException](ColorPack.rgb(256, 0, 0))
    intercept[IllegalArgumentException](ColorPack.rgb(0, -1, 0))
  }

  test("interpolation: corners are exact endpoints, midpoint is yellow-ish") {
    val red = 0xFF0000L
    val green = 0x00FF00L
    assert(ColorPack.interpolate(0.0, red, green) == red)
    assert(ColorPack.interpolate(1.0, red, green) == green)
    // out-of-range fractions clamp (ColorFunctions.java color(fraction,..))
    assert(ColorPack.interpolate(-3.0, red, green) == red)
    assert(ColorPack.interpolate(9.0, red, green) == green)
    // midpoint of red→green in HSB passes through yellow: full red+green
    // channels, no blue
    val mid = ColorPack.interpolate(0.5, red, green)
    assert(((mid >> 16) & 0xff) >= 254, s"mid=$mid")
    assert(((mid >> 8) & 0xff) >= 254, s"mid=$mid")
    assert((mid & 0xff) == 0, s"mid=$mid")
    // system colors are rejected as interpolation endpoints
    intercept[IllegalArgumentException](ColorPack.interpolate(0.5, -2L, green))
  }

  test("render frames with 256-color ANSI escapes") {
    // rgb cube index: 16 + 36r' + 6g' + b' on the 6x6x6 cube
    assert(ColorPack.render("hi", 0xFF0000L) == "\u001b[38;5;196mhi\u001b[0m")
    assert(ColorPack.render("x", 0x00FF00L) == "\u001b[38;5;46mx\u001b[0m")
    // system colors use the raw 0-7 index
    assert(ColorPack.render("x", -2L) == "\u001b[38;5;1mx\u001b[0m")
    assert(ColorPack.renderBoolean(true) == "\u001b[38;5;2m✓\u001b[0m")
    assert(ColorPack.renderBoolean(false) == "\u001b[38;5;1m✗\u001b[0m")
  }

  test("bar geometry: truncated block count, single reset, space padding") {
    val g = 0x00FF00L
    val full = ColorPack.bar(1.0, 10, g, g)
    assert(full.count(_ == '█') == 10)
    assert(full.endsWith("\u001b[0m"))
    val partial = ColorPack.bar(0.25, 40, 0xFF0000L, g)
    assert(partial.count(_ == '█') == 10)
    assert(partial.endsWith(" " * 30))
    // x outside [0,1] clamps to empty / full
    assert(ColorPack.bar(-1.0, 5, g, g).count(_ == '█') == 0)
    assert(ColorPack.bar(2.0, 5, g, g).count(_ == '█') == 5)
    // the first block sits at the low color, the last at the high color
    val two = ColorPack.bar(1.0, 2, 0xFF0000L, g)
    assert(two.startsWith("\u001b[38;5;196m"))
    assert(two.contains("\u001b[38;5;46m"))
  }
}
