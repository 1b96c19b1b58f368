from .migration import MigrationResult, run_migration

__all__ = ["MigrationResult", "run_migration"]
