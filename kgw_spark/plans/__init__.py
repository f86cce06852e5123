"""Plans: the staged KG-construction pipeline and analytics queries."""
