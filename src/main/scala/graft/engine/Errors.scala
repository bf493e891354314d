package graft.engine

/** Engine-level error, mirroring the reference's `ImporterError`
  * (`importer.py:9-10`): raised for data-shape violations discovered
  * during slicing (duplicate columns, duplicate join-key values), as
  * opposed to `IllegalArgumentException` for bad call arguments
  * (the reference's `ValueError`).
  */
class ImporterException(message: String) extends RuntimeException(message)
