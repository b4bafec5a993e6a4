"""app_fastdata_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the VoltDB "app-fastdata" reference app
(see SURVEY.md for the full operator inventory with reference citations).

Architecture: DataFrame / Spark SQL first (Catalyst plans everything),
Structured Streaming for the continuously-maintained state, Pandas UDFs
only where built-in operators can't express the semantics.
"""

__version__ = "0.1.0"
