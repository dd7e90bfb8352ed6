package graft.model

/** Dimension-routing config row.
  *
  * Mirrors the reference POJO `realtime-common/.../bean/TableProcessDim.java:19-38`
  * (sourceTable, sinkTable, sinkColumns csv, sinkFamily, sinkRowKey, op) that is
  * CDC-streamed out of MySQL `gmall2023_config.table_process_dim`
  * (`Constant.java:22-23`) and broadcast to the DIM router
  * (`dim/function/DimBroadcastFunction.java:26-97`).
  */
final case class TableProcessDim(
    sourceTable: String,
    sinkTable: String,
    sinkColumns: String,
    sinkFamily: String,
    sinkRowKey: String,
    op: String)
