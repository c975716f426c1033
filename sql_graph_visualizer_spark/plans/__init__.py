"""Plans: declarative transform rules (YAML/dataclass) compiled to DataFrame plans."""
