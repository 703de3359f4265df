-- Diurnal profile: derived hour-of-day (the reference's TIME-column
-- design point). Twin of operators/windows.py:events_by_hour_of_day.
SELECT hour(ts) AS hour_of_day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY hour_of_day
ORDER BY hour_of_day
