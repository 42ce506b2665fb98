package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared Column-level text helpers for the training-data operators.
  *
  * Everything here is pure Catalyst (whole-stage-codegen friendly, no UDFs)
  * and has a line-for-line ANSI-SQL twin used by the DuckDB oracle, so the
  * driver's hash compare is exact: ratios are single IEEE divisions of
  * exact integers, never accumulated floats.
  */
object TextOps {

  /** Whitespace word split, empties dropped (Python str.split() semantics
    * on single-space text; the corpora are single-spaced ASCII). */
  def words(text: Column): Column =
    filter(split(text, " ", -1), w => w =!= lit(""))

  /** BPE-ish regex tokenization: letter runs | digit runs | single
    * punctuation, over the lowercased text. */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(bpePattern), lit(0))

  /** Count of array elements that appear in a fixed marker set. */
  def markerHits(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => w.isin(markers.map(lit): _*))).cast("long")
}
