"""Write-path policies: checkpointed incremental backfill."""
