package graft.functions

import java.net.InetAddress

import org.apache.spark.sql.SparkSession

/** IP prefix/subnet scalars (reference: presto-main/.../operator/scalar/
  * IpPrefixFunctions.java). The reference's IPADDRESS/IPPREFIX types are
  * scoped out (SURVEY §1.2 type narrowing), so addresses and prefixes are
  * their canonical VARCHAR forms — same values, string-typed. IPv4 and
  * IPv6 both supported via InetAddress; masking is byte-wise like the
  * reference's.
  *
  *   ip_prefix('192.168.255.255', 9)      → '192.128.0.0/9'
  *   ip_subnet_min('192.64.0.0/9')        → '192.64.0.0'
  *   ip_subnet_max('192.64.0.0/9')        → '192.127.255.255'
  *   ip_subnet_range(p)                   → [min, max]
  *   is_subnet_of('192.64.0.0/9', ip)     → boolean
  */
object IpFunctions {

  // InetAddress.getByName falls back to a blocking DNS lookup for any
  // non-literal string — a per-row network call at scale, and hostname
  // resolution where the reference raises INVALID_FUNCTION_ARGUMENT.
  // Only literal v4 dotted-quads and v6 colon forms are accepted.
  private val V4 = "\\d{1,3}(\\.\\d{1,3}){3}".r
  private val V6 = "[0-9a-fA-F:]*:[0-9a-fA-F:]*(:\\d{1,3}(\\.\\d{1,3}){3})?".r

  private def parse(ip: String): Array[Byte] = {
    val isLiteral = V4.matches(ip) || V6.matches(ip)
    require(isLiteral, s"Invalid IP address literal: '$ip'")
    InetAddress.getByName(ip).getAddress
  }

  /** Canonical text form: dotted quad for v4; RFC 5952 for v6 (lowercase
    * hex, longest zero run compressed to `::`) — the same rendering the
    * reference's IPADDRESS type uses, where Java's getHostAddress would
    * print every group. */
  private def render(b: Array[Byte]): String =
    if (b.length == 4) InetAddress.getByAddress(b).getHostAddress
    else {
      val groups = Array.tabulate(8)(i =>
        ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
      // longest run of zero groups (length >= 2) wins; earliest on ties
      var bestStart = -1; var bestLen = 0
      var i = 0
      while (i < 8) {
        if (groups(i) == 0) {
          var jj = i
          while (jj < 8 && groups(jj) == 0) jj += 1
          if (jj - i > bestLen && jj - i >= 2) { bestStart = i; bestLen = jj - i }
          i = jj
        } else i += 1
      }
      if (bestStart < 0) groups.map(Integer.toHexString).mkString(":")
      else {
        val head = groups.take(bestStart).map(Integer.toHexString).mkString(":")
        val tail = groups.drop(bestStart + bestLen).map(Integer.toHexString).mkString(":")
        s"$head::$tail"
      }
    }

  private def maskLow(b: Array[Byte], bits: Int, high: Boolean): Array[Byte] = {
    val total = b.length * 8
    require(bits >= 0 && bits <= total,
      s"prefix length must be in [0, $total]")
    val out = b.clone()
    var i = bits
    while (i < total) {
      val byteIdx = i / 8
      val bitIdx = 7 - (i % 8)
      if (high) out(byteIdx) = (out(byteIdx) | (1 << bitIdx)).toByte
      else out(byteIdx) = (out(byteIdx) & ~(1 << bitIdx)).toByte
      i += 1
    }
    out
  }

  private def splitPrefix(p: String): (Array[Byte], Int) = {
    val slash = p.lastIndexOf('/')
    require(slash > 0, s"Invalid CIDR: '$p'")
    (parse(p.substring(0, slash)), p.substring(slash + 1).toInt)
  }

  private[functions] def ipPrefix(ip: String, bits: Long): String = {
    val addr = parse(ip)
    render(maskLow(addr, bits.toInt, high = false)) + "/" + bits
  }

  private[functions] def subnetMin(prefix: String): String = {
    val (addr, bits) = splitPrefix(prefix)
    render(maskLow(addr, bits, high = false))
  }

  private[functions] def subnetMax(prefix: String): String = {
    val (addr, bits) = splitPrefix(prefix)
    render(maskLow(addr, bits, high = true))
  }

  /** Second argument is an address, or a prefix (reference overload:
    * IpPrefixFunctions.isPrefixSubnetOf) — a prefix is contained when it
    * is at least as specific and its network sits inside the first. */
  private[functions] def isSubnetOf(prefix: String, ipOrPrefix: String): Boolean = {
    val (addr, bits) = splitPrefix(prefix)
    val (candidate, candBits) =
      if (ipOrPrefix.contains('/')) splitPrefix(ipOrPrefix)
      else (parse(ipOrPrefix), -1)
    require(candidate.length == addr.length,
      "IP address version should be the same")
    if (candBits >= 0 && candBits < bits) false
    else java.util.Arrays.equals(
      maskLow(addr, bits, high = false), maskLow(candidate, bits, high = false))
  }

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("ip_prefix", (ip: String, bits: Long) =>
      if (ip == null) null else ipPrefix(ip, bits))
    spark.udf.register("ip_subnet_min", (p: String) =>
      if (p == null) null else subnetMin(p))
    spark.udf.register("ip_subnet_max", (p: String) =>
      if (p == null) null else subnetMax(p))
    spark.udf.register("ip_subnet_range", (p: String) =>
      if (p == null) null else Seq(subnetMin(p), subnetMax(p)))
    spark.udf.register("is_subnet_of", (p: String, ip: String) =>
      if (p == null || ip == null) null
      else java.lang.Boolean.valueOf(isSubnetOf(p, ip)))
  }
}
