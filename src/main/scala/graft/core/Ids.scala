package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** u128 id surface shim (SURVEY §1.2): the reference exposes ids as
  * uuid-or-2xu64 (muopdb.proto:72-81, conversion
  * rs/index_server/src/index_server.rs:193-195). Internally graft uses
  * 16-byte big-endian BinaryType (lexicographic order == unsigned u128
  * order) with helpers to/from uuid strings and (hi, lo) long pairs; the
  * Long fast path stays available for datasets with 64-bit ids. */
object Ids {

  /** (hi, lo) 64-bit pair -> 16-byte big-endian binary. `hex` of a long
    * is its two's-complement form, so unsigned u64 semantics round-trip. */
  def fromHiLo(hi: Column, lo: Column): Column =
    unhex(concat(lpad(hex(hi), 16, "0"), lpad(hex(lo), 16, "0")))

  /** uuid string (8-4-4-4-12 hex) -> 16-byte binary. */
  def fromUuid(u: Column): Column = unhex(regexp_replace(u, "-", ""))

  /** 16-byte binary -> canonical uuid string. */
  def toUuid(b: Column): Column = {
    val h = lower(hex(b))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  /** 16-byte binary -> (hi, lo) signed longs (bit-preserving). */
  def toHi(b: Column): Column = conv(substring(hex(b), 1, 16), 16, 10).cast("decimal(20,0)")
  def toLo(b: Column): Column = conv(substring(hex(b), 17, 16), 16, 10).cast("decimal(20,0)")

  /** Long id -> 16-byte binary (zero-extended), the embedding of the
    * 64-bit fast path into the u128 space. */
  def fromLong(l: Column): Column = unhex(lpad(hex(l), 32, "0"))
}
