package graft.model

/** Typed entities of the pipeline (SURVEY §1.4; reference pydantic models
  * src/core/entities/). Case classes + implicit Encoders give the same
  * schema-validation-at-boundary role pydantic plays in the reference
  * (pd_data_cleaner.py:175-183 `object_class(**row)` -> `df.as[T]`).
  */
final case class Release(
    id: String,
    title: String,
    filename: String,
    url: String,
    year: Int,
    page_count: Int,
    file_meta_created_at: Option[String],
    file_meta_modified_at: Option[String])

/** One page-range unit of work (reference release_batch.py:6-10 — a
  * nested model; here a nested struct column when serialized).
  */
final case class ReleaseBatch(
    batch_number: Int,
    start_page_num: Int,
    end_page_num: Int,
    release: Release)

final case class Record(
    nca_number: String,
    nca_type: String,
    released_date: Option[String],
    department: String,
    purpose: String,
    release_id: String)

final case class Allocation(
    nca_number: String,
    agency: String,
    operating_unit: String,
    amount: Double)
