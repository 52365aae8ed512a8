"""Sources: deterministic synthetic transcript tables and parquet/Iceberg readers."""
from sissaschool_xmlschema_spark.sources.xml_io import (  # noqa: F401
    TURN_SCHEMA_DDL,
    TURN_SCHEMA_DDL_NTZ,
    decode_turn_xml,
    encode_conversation_xml,
    encode_turn_xml,
    read_xml_source,
    write_xml_sink,
)
