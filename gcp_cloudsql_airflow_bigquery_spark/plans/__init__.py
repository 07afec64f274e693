"""Named DataFrame plans: the delegated SQL surface of the reference
(SURVEY.md §2b) expressed as idiomatic Spark DataFrame programs."""
