"""Plan-inspection helpers: assert pushdown/broadcast/codegen properties
of physical plans (SURVEY.md §4)."""
